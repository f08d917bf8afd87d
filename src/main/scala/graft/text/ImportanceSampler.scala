package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Barrier
import graft.functions.TextPrims._

/** DSIR-style importance-weighted data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * estimate a target-domain and a raw-corpus distribution over hashed
  * n-gram features, weight every raw document by how target-like its
  * features are, and keep the top-weighted slice — the domain-matched
  * selection step real pretraining pipelines run between raw crawl and
  * training mix.
  *
  * Distilled to the engine-portable form the correctness gate can verify
  * value-exactly (the [[QualityScorer]] discipline):
  *
  *  - features are hashed BIGRAM buckets (the paper's hashed n-gram
  *    feature space): the p88 two-fold window key folded into
  *    [[NumBuckets]] buckets — the model table is bounded at
  *    [[NumBuckets]] rows no matter the corpus size;
  *  - the two distributions are per-bucket occurrence counts over the
  *    TARGET documents (`targetPred` rows — the in-domain exemplar set)
  *    and the RAW rest;
  *  - the importance weight is transcendental-free: DSIR's per-feature
  *    log-ratio log(p̂_t(b)/p̂_r(b)) is needed only for its SIGN here,
  *    and with Laplace-smoothed estimates p̂(b) = (c+1)/(N+B) that sign
  *    is sign((c_t+1)·(N_r+B) − (c_r+1)·(N_t+B)) — exact 128-bit
  *    cross-multiplication (Spark decimal(38,0) ≡ DuckDB HUGEINT), once
  *    per bucket. A document's importance is its Beta-smoothed
  *    target-vote share (t_votes+1)/(t_votes+r_votes+2) — ONE exact
  *    division — and selection is the deterministic top-`k` under
  *    (importance DESC, doc_id ASC), the greedy analog of the paper's
  *    Gumbel resampling (RNG-free, so the oracle replays it).
  *
  * Scale shape: the same two narrow passes as [[QualityScorer]] — the
  * model aggregate map-side-combines to ≤[[NumBuckets]] rows per task
  * before a tiny bucket shuffle; scoring broadcasts the voted model onto
  * the occurrence rows and partial-aggregates to one row per document
  * before the id exchange; selection is a bounded TakeOrdered, never a
  * global sort. No all-pairs, no window funnel, no collect.
  *
  * Raw documents with fewer than two tokens have no bigram features and
  * are not candidates (no occurrence rows → no importance estimate) —
  * mirrored by the oracle's inner join.
  *
  * Reference scope: the reference has no data-selection machinery; this
  * is part of the beyond-reference LLM-pipeline surface.
  */
object ImportanceSampler {

  /** Feature-hash buckets (bounds the model table and its broadcast). */
  val NumBuckets = 4096L

  /** Default size of the selected slice. */
  val DefaultK = 100

  /** (id, tgt, b) hashed-bigram-bucket occurrence rows — one per bigram
    * occurrence, each carrying the document's 0/1 target flag so the
    * model aggregate needs no doc-table rejoin. Null ids carry nothing. */
  private def occurrences(df: DataFrame, idCol: String, textCol: String,
                          targetPred: Column): DataFrame =
    explodeBuckets(bucketArrays(df, idCol, textCol, targetPred))

  /** (id, tgt, bs) per-document hashed-bigram-bucket arrays — the
    * pre-explode half of [[occurrences]] (the QualityScorer split). */
  private def bucketArrays(df: DataFrame, idCol: String, textCol: String,
                           targetPred: Column): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(textCol).as("__t"),
      when(targetPred, 1).otherwise(0).cast("int").as("tgt"))
    val n = Barrier.once(base, Seq("id", "tgt"), "norm" -> normText(col("__t")))
    val th = Barrier.once(n, Seq("id", "tgt"),
      "th" -> transform(split(col("norm"), " "), charHash _))
    Barrier.once(th, Seq("id", "tgt"),
      "bs" -> transform(hashedWindowKeys(col("th"), 2),
        g => pmod(g, lit(NumBuckets))))
  }

  /** Explode a [[bucketArrays]] frame to (id, tgt, b) occurrence rows. */
  private def explodeBuckets(bs: DataFrame): DataFrame =
    bs.select(col("id"), col("tgt"), explode(col("bs")).as("b"))
      .filter(col("id").isNotNull)

  /** The voted importance model as a standalone table: per hashed-bigram
    * bucket, the SIGN of the smoothed target/raw log-ratio — (b, v) with
    * v ∈ {-1, 0, 1}, ≤[[NumBuckets]] rows. The train-once half of the
    * train/score split a production pipeline runs (the p88/p99
    * convention); [[dsirScore]] and the streaming twin consume it. */
  def dsirModel(df: DataFrame, idCol: String, textCol: String,
                targetPred: Column): DataFrame = {
    val ex = occurrences(df, idCol, textCol, targetPred)
    val model = ex.groupBy("b").agg(
      sum(when(col("tgt") === 1, 1L).otherwise(0L)).as("c_t"),
      sum(when(col("tgt") === 0, 1L).otherwise(0L)).as("c_r"))
    // distribution totals via an unpartitioned window: post-aggregation
    // the model is ≤NumBuckets rows, one-partition is free (p99 pattern)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val withTotals = model.select(col("b"), col("c_t"), col("c_r"),
      sum("c_t").over(w).as("n_t"), sum("c_r").over(w).as("n_r"))
    // per-bucket vote = sign of the smoothed log-ratio, exact in 128-bit
    val lhs = (col("c_t") + 1L).cast("decimal(38,0)") * (col("n_r") + NumBuckets)
    val rhs = (col("c_r") + 1L).cast("decimal(38,0)") * (col("n_t") + NumBuckets)
    withTotals.select(col("b"),
      when(lhs > rhs, 1).when(lhs < rhs, -1).otherwise(0).cast("int").as("v"))
  }

  /** Score every document of `df` against a frozen voted model. Output:
    * (doc_id, n_bigrams, t_votes, r_votes, importance), by doc_id.
    * LEFT join: a bucket the model never saw (possible when scoring a
    * different corpus than the model was trained on) abstains rather
    * than dropping the occurrence. Documents with no bigrams are not
    * scored (no feature evidence — the [[dsirSelect]] candidate rule). */
  def dsirScore(df: DataFrame, idCol: String, textCol: String,
                model: DataFrame): DataFrame = {
    val ex = occurrences(df, idCol, textCol, lit(false))
    ex.join(broadcast(model), Seq("b"), "left")
      .select(col("id"), coalesce(col("v"), lit(0)).as("v"))
      .groupBy("id").agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("t_votes"),
        sum(when(col("v") === -1, 1L).otherwise(0L)).as("r_votes"))
      .withColumn("importance", (col("t_votes") + 1L).cast("double") /
        (col("t_votes") + col("r_votes") + 2L))
      .select(col("id").as("doc_id"), col("n_bigrams"), col("t_votes"),
        col("r_votes"), col("importance"))
      .orderBy("doc_id")
  }

  /** Select the `k` most target-like RAW documents. Output: (doc_id,
    * n_bigrams, t_votes, r_votes, importance, sel_rank), by sel_rank. */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
                 targetPred: Column, k: Int = DefaultK): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // localCheckpoint: model aggregate + raw-side score rollup share the
    // tokenize+bigram-hash projection — one materialized pass, exploded
    // per consumer (the QualityScorer rationale)
    val ex = explodeBuckets(
      bucketArrays(df, idCol, textCol, targetPred).localCheckpoint())
    val model = ex.groupBy("b").agg(
      sum(when(col("tgt") === 1, 1L).otherwise(0L)).as("c_t"),
      sum(when(col("tgt") === 0, 1L).otherwise(0L)).as("c_r"))
    // distribution totals via an unpartitioned window: post-aggregation
    // the model is ≤NumBuckets rows, one-partition is free (p99 pattern)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val withTotals = model.select(col("b"), col("c_t"), col("c_r"),
      sum("c_t").over(w).as("n_t"), sum("c_r").over(w).as("n_r"))
    // per-bucket vote = sign of the smoothed log-ratio, exact in 128-bit
    val lhs = (col("c_t") + 1L).cast("decimal(38,0)") * (col("n_r") + NumBuckets)
    val rhs = (col("c_r") + 1L).cast("decimal(38,0)") * (col("n_t") + NumBuckets)
    val voted = withTotals.select(col("b"),
      when(lhs > rhs, 1).when(lhs < rhs, -1).otherwise(0).cast("int").as("v"))
    // inner join: every raw bucket occurs somewhere, so the model covers
    // it by construction (fused train — unlike the p99 split API)
    val per = ex.filter(col("tgt") === 0)
      .join(broadcast(voted), Seq("b"))
      .groupBy("id").agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("t_votes"),
        sum(when(col("v") === -1, 1L).otherwise(0L)).as("r_votes"))
      .withColumn("importance", (col("t_votes") + 1L).cast("double") /
        (col("t_votes") + col("r_votes") + 2L))
    // bounded top-k (TakeOrdered), then a rank window over k rows only
    val sel = per.orderBy(col("importance").desc, col("id")).limit(k)
    val rw = org.apache.spark.sql.expressions.Window
      .orderBy(col("importance").desc, col("doc_id"))
    sel.select(col("id").as("doc_id"), col("n_bigrams"),
        col("t_votes"), col("r_votes"), col("importance"))
      .withColumn("sel_rank", row_number().over(rw).cast("long"))
      .orderBy("sel_rank")
  }
}
