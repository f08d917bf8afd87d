package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew rehearsal for the banded text miners (round-14 verdict item 7):
  * a Zipf-1.2 token corpus — hotter than the ladder's Zipf-1.0 twin, so
  * the hottest grams/fingerprints push AGAINST the miners' hot-bucket /
  * df caps — run through span dedup (p87's engine), the scoped dedup
  * report (p141), and the winnowing miner (p158), with the per-task
  * duration distribution recorded per op. The claim under test: the
  * caps + AQE keep task time flat (p99/median small) even when the key
  * distribution is adversarially skewed; a straggler would show up as
  * max ≫ p99 ≫ median.
  *
  * Zipf-s sampling by inverse CDF on the bounded power law:
  * rank = (1 − u·(1 − V^(1−s)))^(1/(1−s)), u uniform from the token's
  * hash — rank 1 is drawn with P ∝ 1, rank V with P ∝ V^(−s).
  * At s = 1.2, V = 50 000: the top token carries ~3.5% of all
  * occurrences (vs ~0.9% at s = 1.0).
  *
  * Run: `sbt "runMain graft.SkewMinerBench [docCounts...]"`.
  */
object SkewMinerBench {

  /** Zipf-`s` corpus with [[ScaleCorpusBench.synthCorpus]]'s duplicate
    * structure and lengths. */
  def synthCorpusZipfS(spark: SparkSession, n: Long, s: Double,
                       vocab: Int = 50000): DataFrame = {
    val seed = when(pmod(col("id"), lit(10)).isin(7, 8),
      expr("(id div 10) * 10")).otherwise(col("id")).cast("long")
    val perturb = pmod(col("id"), lit(10)) === 8
    val oneMinusS = 1.0 - s
    spark.range(n).select(col("id").as("doc_id"),
        seed.as("__s"), perturb.as("__p"))
      .select(col("doc_id"), array_join(expr(
        "transform(sequence(0, 49 + pmod(hash(__s), 100)), k -> " +
          s"concat('z', CAST(CAST(pow(1.0 - " +
          "(pmod(hash(__s * 1000003L + k), 1000000) + 0.5) / 1000000.0 * " +
          s"(1.0 - pow($vocab.0, $oneMinusS)), 1.0 / $oneMinusS) AS BIGINT) AS STRING)) || " +
          "IF(__p AND k % 17 = 3, concat('x', CAST(pmod(hash(doc_id * 31L + k), 99989) AS STRING)), ''))"),
        " ").as("text"))
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(500000L)
    val spark = DevBench.session()
    import graft.text.TextDedup

    for (n <- sizes) {
      val corpus = synthCorpusZipfS(spark, n, s = 1.2).persist()
      corpus.count()
      // the headline skew fact: share of all token occurrences carried
      // by the single hottest token (and the hottest trigram's df)
      val toks = corpus.select(explode(split(col("text"), " ")).as("t"))
      val hot = toks.groupBy("t").agg(count(lit(1)).as("c"))
        .agg(max("c").as("mx"), sum("c").as("tot")).head()
      println(s"""{"op":"skew_corpus","docs":$n,"s":1.2,""" +
        s""""hottest_token_share":${f"${hot.getLong(0).toDouble / hot.getLong(1)}%.4f"}}""")

      def run(op: String)(f: => DataFrame): Unit = {
        val (wall, _, snap) = TaskStats.scoped(spark)(DevBench.mat(f))
        println(s"""{"op":"$op","docs":$n,"s":1.2,"sec":${f"$wall%.2f"},""" +
          s""""p99_over_median":${f"${snap.p99OverMedian}%.2f"},${snap.json}}""")
      }

      run("skew_span_dedup")(TextDedup.spanDedup(corpus, "doc_id", "text"))
      run("skew_scoped_dedup")(TextDedup.scopedDedupReport(
        corpus.withColumn("source",
          concat(lit("s"), pmod(col("doc_id"), lit(20)).cast("string"))),
        "doc_id", "text", "source"))
      run("skew_winnowing")(TextDedup.winnowingPairs(
        corpus, "doc_id", "text", TextDedup.MaxDf(16)))
      run("skew_ngram_jaccard")(TextDedup.ngramJaccardPairs(
        corpus, "doc_id", "text", TextDedup.MaxDf(64)))
      corpus.unpersist(false)
    }
    spark.stop()
  }
}
