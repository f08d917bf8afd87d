package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Barrier
import graft.functions.TextPrims._

/** Trained language-id classifier — the fastText-langid archetype of an
  * LLM-data pipeline, as [[QualityScorer]]'s multi-class sibling: hashed
  * token buckets, multinomial Naive-Bayes counts per (bucket, language)
  * trained on the metadata `lang` labels of the pmod(id, 10) ≠ 0 split,
  * every document scored (the holdout rows show generalization). The
  * heuristic marker-based [[TextStats.langId]] (p19) stays as the
  * bootstrap; this is the trained replacement a production pipeline
  * distills once labels exist.
  *
  * Engine-portable multi-class argmax without logs: each bucket votes for
  * the language maximizing its Laplace-smoothed class likelihood
  * (c + 1) / (N_lang + [[NumBuckets]]). Both factors are exact in double
  * (well below 2^53) and IEEE division is correctly rounded, so Spark and
  * DuckDB compute IDENTICAL ratio bits and the (ratio DESC, lang ASC)
  * argmax picks the same language on both engines — no transcendentals,
  * same guarantee class as the scorer's 128-bit sign trick. Smoothing
  * makes class-total size matter exactly as NB says it should: a bucket
  * unseen for a language still carries likelihood 1/(N + B).
  *
  * A bucket with ZERO training occurrences across all classes is OOV and
  * abstains (matching the oracle's train-filtered model by construction);
  * a document whose every token is OOV (or that has no tokens) predicts
  * 'und' with top_votes 0.
  *
  * Scale shape — the [[QualityScorer]] contract: tokenize→hash→explode is
  * a narrow projection; the model aggregate map-side-combines to
  * ≤ [[NumBuckets]]·C rows per task before a tiny (bucket, lang) shuffle;
  * the per-class totals collect is bounded at C rows (the language count
  * — the lowestIdCentroids collect class) and RE-AGGREGATES the
  * materialized model table, never the corpus; the ≤[[NumBuckets]]-row
  * vote table broadcasts onto the occurrence rows; and the per-document
  * rollup partial-aggregates to ≤ C+1 fixed-width rows per document
  * before the id exchange. TWO narrow corpus passes (model, score) — no
  * full-data shuffle, no window funnel, no unbounded collect.
  *
  * Reference scope: the reference has no classifier of any kind; this is
  * part of the beyond-reference LLM-pipeline surface the brief requires
  * (p19's marker heuristic is the engine's own bootstrap).
  */
object LangClassifier {

  /** Feature-hash buckets, shared with [[QualityScorer.NumBuckets]]. */
  val NumBuckets: Long = QualityScorer.NumBuckets

  /** pmod(id, HoldoutMod) = 0 rows are held out of training. */
  val HoldoutMod: Int = QualityScorer.HoldoutMod

  /** Sentinel for zero-vote documents; distinct from any metadata code by
    * convention (and harmless if a corpus really labels rows 'und'). */
  val Unknown = "und"

  /** (id, label_lang, b) hashed-bucket occurrence rows — one per token
    * occurrence. */
  private def occurrences(df: DataFrame, idCol: String, textCol: String,
                          langCol: String): DataFrame =
    explodeBuckets(bucketArrays(df, idCol, textCol, langCol))

  /** (id, label_lang, bs) per-document hashed-bucket arrays — the
    * pre-explode half of [[occurrences]] (the QualityScorer split). */
  private def bucketArrays(df: DataFrame, idCol: String, textCol: String,
                           langCol: String): DataFrame = {
    val n = Barrier.once(
      df.select(col(idCol).cast("long").as("id"),
        col(langCol).as("label_lang"), col(textCol).as("__t")),
      Seq("id", "label_lang"), "norm" -> normText(col("__t")))
    val t = Barrier.once(n, Seq("id", "label_lang"),
      "t" -> split(col("norm"), " "))
    Barrier.once(t, Seq("id", "label_lang"),
      "bs" -> transform(col("t"), tok => pmod(charHash(tok), lit(NumBuckets))))
  }

  /** Explode a [[bucketArrays]] frame to (id, label_lang, b) rows. */
  private def explodeBuckets(bs: DataFrame): DataFrame =
    bs.select(col("id"), col("label_lang"), explode(col("bs")).as("b"))
      .filter(col("id").isNotNull)

  private def trainRow: Column = pmod(col("id"), lit(HoldoutMod.toLong)) =!= 0L

  /** The per-bucket vote table (b, oov, vlang): language with the highest
    * smoothed likelihood at that bucket, ties toward the lexicographically
    * smallest language. `classTotals` is the driver-collected (lang,
    * n_train_occurrences) list — C rows; `trainCond` picks the training
    * rows (folded into the aggregate as conditional sums, not a WHERE —
    * the p88 canonical-plan lesson). */
  private def votedTable(model0: DataFrame,
                         classTotals: Seq[(String, Long)]): DataFrame = {
    val perB = model0.groupBy("b")
      .agg(collect_list(struct(col("label_lang").as("lang"), col("c"))).as("present"),
        sum("c").as("total"))
    // explode the C-class literal grid per bucket; lookup the present
    // count (0 when the class never saw this bucket in ANY split)
    val clsLit = typedLit(classTotals.map { case (l, n) => (l, n) })
    perB
      .select(col("b"), col("total"), col("present"),
        explode(clsLit).as("cls"))
      .select(col("b"), col("total"),
        col("cls._1").as("lang"), col("cls._2").as("n"),
        // get() is 0-based and NULL on an empty filter result (a class
        // that never saw this bucket in any split) — element_at throws
        // under ANSI mode there
        coalesce(
          get(filter(col("present"),
            p => p.getField("lang") === col("cls._1")), lit(0)).getField("c"),
          lit(0L)).as("c"))
      .select(col("b"), col("total"), col("lang"),
        ((col("c") + 1L).cast("double") /
          (col("n") + NumBuckets).cast("double")).as("ratio"))
      .groupBy("b", "total")
      .agg(min(struct((-col("ratio")).as("negRatio"), col("lang"))).as("best"))
      .select(col("b"), (col("total") === 0L).as("oov"),
        col("best.lang").as("vlang"))
  }

  /** Fused train+score (the p112 query): metadata labels, NB counts over
    * the train split, every document scored. Output: (doc_id, n_tokens,
    * n_oov, top_votes, predicted_lang, label_lang) by doc_id. */
  def langScorer(df: DataFrame, idCol: String, textCol: String,
                 langCol: String): DataFrame = {
    // localCheckpoint: the model aggregate and the score rollup share the
    // normText+tokenize+hash projection — materialize the per-document
    // bucket arrays once, explode per pass (the QualityScorer rationale)
    val ex = explodeBuckets(
      bucketArrays(df, idCol, textCol, langCol).localCheckpoint())
    val voted = votedFrom(ex, langCol, trainRow)
    val occ = ex.join(broadcast(voted), Seq("b"), "left")
      .select(col("id"), col("label_lang"),
        when(coalesce(col("oov"), lit(true)), lit("__oov"))
          .otherwise(col("vlang")).as("vl"))
    val votes = occ.groupBy("id", "label_lang", "vl")
      .agg(count(lit(1)).as("cnt"))
    val per = votes.groupBy("id", "label_lang").agg(
      sum(col("cnt")).as("n_tokens"),
      sum(when(col("vl") === "__oov", col("cnt")).otherwise(0L)).as("n_oov"),
      min(when(col("vl") =!= "__oov",
        struct((-col("cnt")).as("neg"), col("vl").as("lang")))).as("best"))
    df.select(col(idCol).cast("long").as("doc_id"),
        col(langCol).as("label_lang"))
      .join(per.select(col("id").as("doc_id"), col("n_tokens"),
        col("n_oov"), col("best")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(-col("best.neg"), lit(0L)).as("top_votes"),
        coalesce(col("best.lang"), lit(Unknown)).as("predicted_lang"),
        col("label_lang"))
      .orderBy("doc_id")
  }

  /** Shared: class totals (bounded collect, C rows) + the vote table for
    * a given training condition. */
  private def votedFrom(ex: DataFrame, langCol: String,
                        trainCond: Column): DataFrame = {
    // The (bucket, lang) count table is bounded at NumBuckets·C rows at
    // ANY corpus size — the one frame worth materializing: the class
    // totals now derive from it by re-aggregation (n = Σ_b c, exact
    // integer sums — one full tokenize pass over the corpus saved vs the
    // separate filter+count this replaces) and the vote table reads the
    // same materialized rows. Classes with zero training occurrences are
    // filtered out, exactly reproducing their absence from the old
    // train-filtered aggregate. A (b, lang) pair seen only in holdout
    // rows keeps a c=0 row, which the class grid erases any difference of.
    val model0 = ex.groupBy("b", "label_lang")
      .agg(sum(when(trainCond, 1L).otherwise(0L)).as("c"))
      .localCheckpoint()
    val classTotals = graft.ops.Adaptive.boundedCollect(
      model0.groupBy("label_lang").agg(sum(col("c")).as("n"))
        .filter(col("n") > 0L),
      "langScorer class cardinality (column '" + langCol + "')",
      "a lower-cardinality label column — classes must be enumerable")
      .map { r =>
        require(!r.isNullAt(0),
          s"label column '$langCol' contains nulls — class labels must be non-null")
        r.getString(0) -> r.getLong(1)
      }.sortBy(_._1)
    votedTable(model0, classTotals)
  }

  /** The frozen model as a standalone table (b, oov, vlang), trained on
    * ALL of `df` — the caller picks the training corpus, as a production
    * pipeline does (train once offline, score any stream against the
    * frozen table; the [[QualityScorer.qualityModel]] convention). */
  def langVotedModel(df: DataFrame, idCol: String, textCol: String,
                     langCol: String): DataFrame =
    votedFrom(occurrences(df, idCol, textCol, langCol), langCol, lit(true))

  /** Score `df` against a frozen [[langVotedModel]] table — no labels
    * needed. Output: (doc_id, n_tokens, n_oov, top_votes,
    * predicted_lang) by doc_id. */
  def langScore(df: DataFrame, idCol: String, textCol: String,
                voted: DataFrame): DataFrame = {
    val n = Barrier.once(
      df.select(col(idCol).cast("long").as("id"), col(textCol).as("__t")),
      Seq("id"), "norm" -> normText(col("__t")))
    val t = Barrier.once(n, Seq("id"), "t" -> split(col("norm"), " "))
    val bs = Barrier.once(t, Seq("id"),
      "bs" -> transform(col("t"), tok => pmod(charHash(tok), lit(NumBuckets))))
    val ex = bs.select(col("id"), explode(col("bs")).as("b"))
      .filter(col("id").isNotNull)
    val occ = ex.join(broadcast(voted), Seq("b"), "left")
      .select(col("id"),
        when(coalesce(col("oov"), lit(true)), lit("__oov"))
          .otherwise(col("vlang")).as("vl"))
    val votes = occ.groupBy("id", "vl").agg(count(lit(1)).as("cnt"))
    val per = votes.groupBy("id").agg(
      sum(col("cnt")).as("n_tokens"),
      sum(when(col("vl") === "__oov", col("cnt")).otherwise(0L)).as("n_oov"),
      min(when(col("vl") =!= "__oov",
        struct((-col("cnt")).as("neg"), col("vl").as("lang")))).as("best"))
    df.select(col(idCol).cast("long").as("doc_id"))
      .join(per.select(col("id").as("doc_id"), col("n_tokens"),
        col("n_oov"), col("best")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(-col("best.neg"), lit(0L)).as("top_votes"),
        coalesce(col("best.lang"), lit(Unknown)).as("predicted_lang"))
      .orderBy("doc_id")
  }

  /** Held-out confusion matrix (the p113 query): one row per (label,
    * predicted) pair over the holdout split — integer counts, the p100
    * convention generalized to C×C cells. `scored` must be a
    * [[langScorer]] frame. */
  def langConfusion(scored: DataFrame): DataFrame =
    scored.filter(pmod(col("doc_id"), lit(HoldoutMod.toLong)) === 0L)
      .groupBy("label_lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("label_lang", "predicted_lang")
}
