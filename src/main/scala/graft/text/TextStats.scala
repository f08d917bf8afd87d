package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextPrims._

/** Per-document text analysis for LLM-data pipelines: quality stats,
  * language identification, and content fingerprinting. Pure narrow
  * projections — no shuffle at all, each document is scored independently,
  * so throughput scales linearly with executors at any corpus size.
  */
object TextStats {

  /** Length / token / stopword statistics and a deterministic quality
    * score. All double math is a fixed left-to-right expression so the
    * DuckDB oracle reproduces it bit-for-bit. */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTokens = size(toks)
    val stopHits = size(filter(toks, t => t.isin(Stopwords: _*)))
    val stopRatio = stopHits.cast("double") / nTokens
    df.select(
      col(idCol).as("id"),
      length(normText(col(textCol))).cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_unique_tokens"),
      (aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / nTokens)
        .as("avg_token_len"),
      stopRatio.as("stopword_ratio"),
      // crude quality proxy: enough tokens, not stopword-soup.
      (least(lit(1.0), nTokens.cast("double") / 200.0) * (lit(1.0) - stopRatio))
        .as("quality_score"))
      .orderBy("id")
  }

  /** Marker-word language heuristic: count hits against per-language
    * stopword lists, pick the max with a fixed precedence (en, es, fr, de),
    * `und` (undetermined) when nothing matches. A real pipeline would use
    * character n-gram profiles; the operator shape (narrow projection,
    * deterministic argmax) is the same. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val hits: Map[String, Column] = LangMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*))).cast("long")
    }.toMap
    val Seq(en, es, fr, de) = Seq("en", "es", "fr", "de").map(hits)
    df.select(
      col(idCol).as("id"),
      en.as("en_hits"), es.as("es_hits"), fr.as("fr_hits"), de.as("de_hits"),
      when(en + es + fr + de === 0L, "und")
        .when(en >= es && en >= fr && en >= de, "en")
        .when(es >= fr && es >= de, "es")
        .when(fr >= de, "fr")
        .otherwise("de").as("predicted_lang"))
      .orderBy("id")
  }

  /** Content fingerprint: whole-text polynomial hash plus the min/max of a
    * rolling 8-char-gram hash family (the winnowing building block — the
    * min-gram hash is stable under small edits, unlike the content hash).
    * Documents shorter than 8 normalized chars get null gram stats. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withNorm = df.select(col(idCol).as("id"), normText(col(textCol)).as("norm"))
    withNorm
      // substr with a column position is SQL-only, hence expr().
      .withColumn("grams",
        when(length(col("norm")) >= 8,
          expr("transform(sequence(1, length(norm) - 7), i -> substr(norm, i, 8))"))
          .otherwise(array().cast("array<string>")))
      .withColumn("gram_hashes", transform(col("grams"), charHash _))
      // materialization boundary: min/max/size each reference gram_hashes —
      // without it CollapseProject re-hashes every gram three times.
      .persist()
      .select(
        col("id"),
        charHash(col("norm")).as("content_hash"),
        array_min(col("gram_hashes")).as("min_gram_hash"),
        array_max(col("gram_hashes")).as("max_gram_hash"),
        size(col("gram_hashes")).cast("long").as("n_grams"))
      .orderBy("id")
  }
}
