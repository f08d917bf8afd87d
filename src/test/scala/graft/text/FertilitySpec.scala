package graft.text

import graft.SparkSpec

/** [[BpeTokenizer.fertilityReport]] — the per-language rollup pinned
  * against a driver-side recomputation from the (independently
  * fixture-pinned) [[BpeTokenizer.tokenize]] output. */
class FertilitySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "aa", "low low lower lowest"),
    (2L, "aa", "newer newest new"),
    (3L, "bb", "wide wider widest low"),
    (4L, "bb", ""),
    (5L, "aa", "low low low"))

  "fertilityReport" should "roll up exactly what tokenize reports, per language" in {
    val df = docs.toDF("doc_id", "lang", "text")
    val merges = BpeTokenizer.trainMerges(df, "text", nMerges = 12)
    val perDoc = BpeTokenizer.tokenize(df, "doc_id", "text", merges)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"),
          r.getAs[Long]("n_bpe_tokens"))))
      .toMap
    val langOf = docs.map(d => d._1 -> d._2).toMap
    val expected = perDoc.toSeq.groupBy(kv => langOf(kv._1)).map {
      case (lang, rows) =>
        val w = rows.map(_._2._1).sum; val c = rows.map(_._2._2).sum
        val t = rows.map(_._2._3).sum
        lang -> ((rows.size.toLong, w, t, c,
          t.toDouble / w, c.toDouble / t))
    }
    val got = BpeTokenizer.fertilityReport(df, "doc_id", "text", "lang", merges)
      .collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_words"),
          r.getAs[Long]("total_tokens"), r.getAs[Long]("total_chars"),
          r.getAs[Double]("tokens_per_word"),
          r.getAs[Double]("chars_per_token"))))
      .toMap
    got shouldBe expected
    got.values.map(_._1).sum shouldBe docs.size.toLong
  }
}
