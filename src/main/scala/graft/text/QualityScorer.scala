package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Barrier
import graft.functions.TextPrims._

/** Trained quality classifier — the fastText/CCNet-style component of an
  * LLM-data pipeline (train a cheap linear model on a labeled split, score
  * every document, filter on the score), distilled to the engine-portable
  * form the correctness gate can verify value-exactly:
  *
  *  - features are hashed token buckets (the fastText hashing trick):
  *    bucket = charHash(token) mod [[NumBuckets]] — fixed-width longs, so
  *    the model table is bounded at [[NumBuckets]] rows no matter the
  *    corpus size;
  *  - the model is multinomial Naive-Bayes occurrence counts per bucket
  *    and class, trained on the pmod(id, [[HoldoutMod]]) ≠ 0 split (the
  *    p88 bigram-novelty convention — every document is still scored, so
  *    the holdout rows show what the model does on unseen text);
  *  - labels for the fused query come from the deterministic quality
  *    heuristic ([[TextStats.stats]]'s quality_score ≥ [[QualityThreshold]])
  *    — the distillation setup real pipelines run (heuristic or
  *    human-labeled seed set → cheap classifier applied at corpus scale);
  *    the split API ([[qualityModel]]/[[qualityScore]]) takes any caller
  *    0/1 label column instead;
  *  - scoring is transcendental-free: NB's log-likelihood needs `ln`
  *    (IEEE 754 does not require it correctly rounded, so Spark and DuckDB
  *    may disagree in the last ulp). Instead each BUCKET votes by the sign
  *    of its per-token log-likelihood ratio — which needs no log at all:
  *    sign(ln(P(b|pos)/P(b|neg))) = sign(c_pos[b]·N_neg − c_neg[b]·N_pos),
  *    evaluated EXACTLY in 128-bit (Spark decimal(38,0) ≡ DuckDB HUGEINT,
  *    both exact, so no overflow even at trillion-token class totals) and
  *    only once per bucket inside the ≤[[NumBuckets]]-row broadcast model
  *    — the per-token hot path is a broadcast lookup plus integer vote
  *    sums (order-independent, unlike float sums). A document's score is
  *    its Beta-smoothed positive-vote share:
  *    (pos_votes + 1) / (pos_votes + neg_votes + 2) — ONE exact division.
  *
  * Scale shape: NO full-data shuffle at all. Tokenize→hash→explode is a
  * narrow projection (a document's occurrence rows stay in its partition),
  * so (a) the model aggregate map-side-combines to at most [[NumBuckets]]
  * rows per task before a tiny bucket shuffle, and (b) on the scoring
  * side the ≤[[NumBuckets]]-row vote table is BROADCAST onto the
  * occurrence rows and the per-document rollup's partial aggregation
  * collapses to ONE fixed-width row per document before the id exchange.
  * The corpus is read twice (model pass + scoring pass) — two
  * embarrassingly-parallel narrow passes, deliberately preferred over
  * materializing an all-token-occurrences exchange, which is the thing
  * that would actually hurt at 100 TB (and which Spark's exchange reuse
  * does not reliably share into a broadcast build side). No all-pairs,
  * no window funnel, no collect.
  *
  * Reference scope: the reference has no trained scorer (its quality
  * signals are the rule-based ones p18/p40–p42 mirror); this is part of
  * the beyond-reference LLM-pipeline surface the brief requires.
  */
object QualityScorer {

  /** Feature-hash buckets (fastText-style hashing trick). Bounds the model
    * table — and therefore the broadcast — regardless of corpus size. */
  val NumBuckets = 4096L

  /** Documents with heuristic quality_score ≥ this are the positive class
    * of the fused query's distillation labels (≈ the corpus median at
    * sf0.01, so both classes are populated at every test scale). */
  val QualityThreshold = 0.25

  /** pmod(id, HoldoutMod) = 0 rows are held out of training. */
  val HoldoutMod = 10

  /** (id, t, hiq): token array + 0/1 heuristic label, each computed once
    * per row. The label expression is the exact [[TextStats.stats]]
    * quality_score double fold, so "fused labels ≡ stats().quality_score ≥
    * threshold" is a spec-pinned identity, not a re-derivation. */
  private[text] def labeled(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = Barrier.once(
      df.select(col(idCol).as("id"), col(textCol).as("__t")), Seq("id"),
      "norm" -> normText(col("__t")))
    val t = Barrier.once(n, Seq("id"), "t" -> split(col("norm"), " "))
    val counters = Barrier.once(t, Seq("id", "t"),
      "n_tokens" -> size(col("t")).cast("long"),
      "stop_hits" -> size(filter(col("t"), x => x.isin(Stopwords: _*))).cast("long"))
    val stopRatio = col("stop_hits").cast("double") / col("n_tokens")
    val quality = least(lit(1.0), col("n_tokens").cast("double") / 200.0) *
      (lit(1.0) - stopRatio)
    counters.select(col("id"), col("t"),
      when(quality >= QualityThreshold, 1).otherwise(0).cast("int").as("hiq"))
  }

  /** (id, hiq, bs) per-document hashed-bucket ARRAYS — the pre-explode
    * half of [[occurrences]], split out so the fused train+score path can
    * materialize ONE tokenize+hash pass and explode it per consumer. */
  private def bucketArrays(lab: DataFrame): DataFrame =
    Barrier.once(lab, Seq("id", "hiq"),
      "bs" -> transform(col("t"), tok => pmod(charHash(tok), lit(NumBuckets))))

  /** Explode a [[bucketArrays]] frame to (id, hiq, b) occurrence rows. */
  private def explodeBuckets(bs: DataFrame): DataFrame =
    bs.select(col("id").cast("long").as("id"), col("hiq"), explode(col("bs")).as("b"))
      .filter(col("id").isNotNull)

  /** (id, hiq, b) hashed-bucket occurrence rows — one per token occurrence
    * (multinomial counts, not presence). Null ids/texts carry nothing. */
  private def occurrences(lab: DataFrame): DataFrame =
    explodeBuckets(bucketArrays(lab))

  /** Per-bucket class counts over `ex`, training only rows passing
    * `trainRow` (folded into the aggregate as conditional sums, not a
    * WHERE — a filter would push below the shared exchange on one branch
    * only and split the canonical plans; the p88 lesson). */
  private def modelFrom(ex: DataFrame, trainRow: Column): DataFrame =
    ex.groupBy("b").agg(
      sum(when(trainRow && col("hiq") === 1, 1L).otherwise(0L)).as("c_pos"),
      sum(when(trainRow && col("hiq") === 0, 1L).otherwise(0L)).as("c_neg"))

  /** Broadcast-join `model` onto the occurrence rows and roll up per
    * document. LEFT join: a bucket the model never saw (possible in the
    * split API, impossible in the fused query) is OOV with zero evidence,
    * not a dropped token. `withLabel` keeps the per-doc label column for
    * the fused/eval path. */
  private def scoreFrame(df: DataFrame, idCol: String, ex: DataFrame,
                         model: DataFrame, withLabel: Boolean): DataFrame = {
    // class totals via an unpartitioned window over the model aggregate:
    // post-aggregation the model is ≤NumBuckets rows, so funneling them
    // through one partition is free — and it keeps model→voted a single
    // linear plan branch (a separate totals aggregate would re-derive the
    // model subtree; exchange reuse does not reliably dedupe it into the
    // broadcast build side)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val withTotals = model.select(col("b"), col("c_pos"), col("c_neg"),
      sum("c_pos").over(w).as("n_pos"), sum("c_neg").over(w).as("n_neg"))
    // per-bucket vote = sign(c_pos·N_neg − c_neg·N_pos), the sign of the
    // NB log-likelihood ratio — exact 128-bit cross-multiplication, done
    // once per bucket on the tiny model table, never per token
    val voted = withTotals.select(col("b"),
      (col("c_pos") + col("c_neg") === 0L).as("oov"),
      when(col("c_pos").cast("decimal(38,0)") * col("n_neg") >
           col("c_neg").cast("decimal(38,0)") * col("n_pos"), 1)
        .when(col("c_pos").cast("decimal(38,0)") * col("n_neg") <
              col("c_neg").cast("decimal(38,0)") * col("n_pos"), -1)
        .otherwise(0).cast("int").as("v"))
    val perDoc = ex.join(broadcast(voted), Seq("b"), "left")
      .select(col("id"), col("hiq"),
        // a bucket absent from the model (split API) is OOV and abstains
        coalesce(col("oov"), lit(true)).as("oov"),
        coalesce(col("v"), lit(0)).as("v"))
      .groupBy("id").agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("oov"), 1L).otherwise(0L)).as("n_oov"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("pos_votes"),
        sum(when(col("v") === -1, 1L).otherwise(0L)).as("neg_votes"),
        max(col("hiq")).as("label_hiq"))
    val filled = df.select(col(idCol).cast("long").as("doc_id"))
      .join(perDoc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("pos_votes"), lit(0L)).as("pos_votes"),
        coalesce(col("neg_votes"), lit(0L)).as("neg_votes"),
        col("label_hiq"))
    val nbScore = (col("pos_votes") + 1L).cast("double") /
      (col("pos_votes") + col("neg_votes") + 2L)
    val out = filled.select(
      Seq(col("doc_id"), col("n_tokens"), col("n_oov"),
        col("pos_votes"), col("neg_votes"),
        nbScore.as("nb_score"),
        when(nbScore >= 0.5, 1).otherwise(0).cast("int").as("predicted_hiq")) ++
        (if (withLabel) Seq(col("label_hiq")) else Nil): _*)
    out.orderBy("doc_id")
  }

  /** Fused train+score (the p99 query): heuristic labels, NB counts over
    * the pmod(id, HoldoutMod) ≠ 0 split, every document scored. Output:
    * (doc_id, n_tokens, n_oov, pos_votes, neg_votes, nb_score,
    * predicted_hiq, label_hiq). ≡ [[qualityScore]] over
    * [[qualityModel]] of the labeled train split — spec-pinned. */
  def qualityScorer(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // localCheckpoint: the model aggregate and the score rollup are two
    // corpus passes over the SAME occurrence rows (inherently sequential —
    // scoring needs the trained votes), but the expensive part of each
    // pass is the shared normText+tokenize+hash projection. Materializing
    // the per-document bucket arrays (one narrow row per document) runs
    // that projection ONCE; both passes re-read the blocks and pay only
    // the explode + aggregate (the shingle-miner convention, batch 2).
    val ex = explodeBuckets(
      bucketArrays(labeled(df, idCol, textCol)).localCheckpoint())
    scoreFrame(df, idCol, ex,
      modelFrom(ex, pmod(col("id"), lit(HoldoutMod.toLong)) =!= 0L),
      withLabel = true)
  }

  /** The model as a standalone table (b, c_pos, c_neg): per-bucket token
    * occurrence counts over ALL of `df`, classed by the caller's 0/1
    * `labelCol` — the caller picks the training corpus, as a production
    * pipeline does (train once offline, score any corpus against the
    * frozen table). */
  def qualityModel(df: DataFrame, idCol: String, textCol: String,
                   labelCol: String): DataFrame = {
    val lab = df.select(col(idCol).as("id"), col(textCol).as("__t"),
        col(labelCol).cast("int").as("hiq"))
      .select(col("id"), col("hiq"), normText(col("__t")).as("norm"))
    val t = Barrier.once(lab, Seq("id", "hiq"), "t" -> split(col("norm"), " "))
    modelFrom(occurrences(t), lit(true))
  }

  /** Score `df` against a frozen [[qualityModel]] table. Buckets absent
    * from the model count as OOV with zero evidence. Output: the fused
    * columns minus label_hiq (scoring needs no labels). */
  def qualityScore(df: DataFrame, idCol: String, textCol: String,
                   model: DataFrame): DataFrame =
    scoreFrame(df, idCol, occurrences(labeled(df, idCol, textCol)), model,
      withLabel = false)

  /** Threshold sweep (the p107 query): the scorer's operating curve on
    * the holdout split — for each candidate keep-threshold, the kept-doc
    * count, confusion counts, and null-guarded precision/recall. This is
    * the calibration table a pipeline reads to pick its filter threshold
    * (the "what do we trade at 0.6 vs 0.7" question every quality-filter
    * deployment answers before a full-corpus run). `scored` must be a
    * [[qualityScorer]] frame. Docs with a null label (no tokens) stay in
    * `n_holdout` but join no confusion cell, on both engines.
    *
    * Scale shape: ONE narrow pass — the ≤|thresholds|-fold explode
    * multiplies only the holdout rows and the per-threshold aggregate
    * partial-combines to ≤|thresholds| rows per task before a tiny
    * shuffle; integer counts + exact divisions, so the DuckDB twin
    * matches bitwise. */
  def thresholdSweep(scored: DataFrame,
                     thresholds: Seq[Double] = DefaultThresholds): DataFrame = {
    val keep = col("nb_score") >= col("threshold")
    scored
      .filter(pmod(col("doc_id"), lit(HoldoutMod.toLong)) === 0L)
      .select(col("nb_score"), col("label_hiq"),
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      .groupBy("threshold")
      .agg(
        count(lit(1)).as("n_holdout"),
        sum(when(keep, 1L).otherwise(0L)).as("n_keep"),
        sum(when(keep && col("label_hiq") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(keep && col("label_hiq") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(!keep && col("label_hiq") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(!keep && col("label_hiq") === 0, 1L).otherwise(0L)).as("tn"))
      .select(col("threshold"), col("n_holdout"), col("n_keep"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0L,
          col("tp").cast("double") / (col("tp") + col("fp"))).as("precision"),
        when(col("tp") + col("fn") > 0L,
          col("tp").cast("double") / (col("tp") + col("fn"))).as("recall"))
      .orderBy("threshold")
  }

  /** p107's candidate keep-thresholds: deciles 0.1..0.9. Exact double
    * literals shared with the oracle printer. */
  val DefaultThresholds: Seq[Double] = (1 to 9).map(_ / 10.0)

  /** Held-out evaluation (the p100 query): confusion counts + accuracy of
    * the scorer's predictions against the heuristic labels on the
    * holdout split, one row. `scored` must be a [[qualityScorer]] frame
    * (needs predicted_hiq + label_hiq). Integer sums, one division. */
  def scorerEval(scored: DataFrame): DataFrame =
    scored.filter(pmod(col("doc_id"), lit(HoldoutMod.toLong)) === 0L)
      .agg(
        count(lit(1)).as("n_holdout"),
        sum(when(col("predicted_hiq") === 1 && col("label_hiq") === 1, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("predicted_hiq") === 1 && col("label_hiq") === 0, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("predicted_hiq") === 0 && col("label_hiq") === 1, 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("predicted_hiq") === 0 && col("label_hiq") === 0, 1L)
          .otherwise(0L)).as("tn"))
      .select(col("n_holdout"), col("tp"), col("fp"), col("fn"), col("tn"),
        (col("tp") + col("tn")).cast("double").divide(col("n_holdout"))
          .as("accuracy"))
}
