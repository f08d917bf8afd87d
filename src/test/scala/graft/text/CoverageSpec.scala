package graft.text

import graft.SparkSpec

/** [[BpeTokenizer.coverageReport]] / [[BpeTokenizer.coverageSummary]] —
  * pinned against a driver-side recomputation from the (independently
  * fixture-pinned) per-word token counts, plus the structural
  * invariants: a word covered by enough merges is single-token, the
  * summary is exactly the report's universe rolled up. */
class CoverageSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "low low low lower lowest"),
    (2L, "low lower newest newest"),
    (3L, "wide wider widest low low"))

  "coverageReport" should "report per-word fragmentation consistent with tokenize" in {
    val df = docs.toDF("doc_id", "text")
    val merges = BpeTokenizer.trainMerges(df, "text", nMerges = 30)
    val report = BpeTokenizer.coverageReport(df, "text", merges, topK = 100)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

    // independent recomputation: word frequency from the raw corpus,
    // token count via tokenize() on a one-word document
    val words = docs.flatMap(_._2.split(" "))
    val freqs = words.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    report.keySet shouldBe freqs.keySet
    val wordDf = freqs.keys.toSeq.sorted.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val tokCounts = BpeTokenizer.tokenize(wordDf, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_bpe_tokens")).toMap
    val expected = freqs.keys.toSeq.sorted.zipWithIndex.map { case (w, i) =>
      w -> ((freqs(w), tokCounts(i.toLong), tokCounts(i.toLong) == 1L))
    }.toMap
    report shouldBe expected
    // 30 merges on this tiny vocabulary cover the most frequent word
    report("low")._3 shouldBe true
  }

  it should "honor the top-K frequency cut" in {
    val df = docs.toDF("doc_id", "text")
    val merges = BpeTokenizer.trainMerges(df, "text", nMerges = 5)
    val top2 = BpeTokenizer.coverageReport(df, "text", merges, topK = 2)
      .collect().map(_.getString(0)).toSeq
    // "low" (freq 6) then "newest" (freq 2, earliest alphabetically of
    // the freq-2 ties: lower=2, newest=2 → "lower" < "newest"... order is
    // (freq DESC, word ASC) so the freq-2 block starts at "lower"
    top2 shouldBe Seq("low", "lower")
  }

  "mergeBudgetCurve" should "match per-budget tokenize totals and be monotone" in {
    val df = docs.toDF("doc_id", "text")
    val merges = BpeTokenizer.trainMerges(df, "text", nMerges = 12)
    val budgets = Seq(2, 5, 12).filter(_ <= merges.length)
    val curve = BpeTokenizer.mergeBudgetCurve(df, "text", merges, budgets)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    curve.map(_._1).toSeq shouldBe budgets
    // each budget row equals tokenize() under the same prefix, summed
    budgets.zip(curve).foreach { case (b, (_, tokens, chars, cpt)) =>
      val tok = BpeTokenizer.tokenize(df, "doc_id", "text", merges.take(b))
        .collect()
      tokens shouldBe tok.map(_.getAs[Long]("n_bpe_tokens")).sum
      chars shouldBe tok.map(_.getAs[Long]("n_chars")).sum
      cpt shouldBe chars.toDouble / tokens
    }
    // more merges never produce MORE tokens
    curve.map(_._2).toSeq shouldBe curve.map(_._2).toSeq.sorted.reverse
  }

  it should "drop budgets beyond the trained table instead of aliasing them" in {
    val df = docs.toDF("doc_id", "text")
    val merges = BpeTokenizer.trainMerges(df, "text", nMerges = 6)
    val curve = BpeTokenizer.mergeBudgetCurve(df, "text", merges,
      Seq(3, 6, 1000)).collect()
    curve.map(_.getInt(0)).toSeq shouldBe Seq(3, 6)
  }

  "coverageSummary" should "equal the report's universe rolled up" in {
    val df = docs.toDF("doc_id", "text")
    val merges = BpeTokenizer.trainMerges(df, "text", nMerges = 12)
    val full = BpeTokenizer.coverageReport(df, "text", merges, topK = 1000)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val row = BpeTokenizer.coverageSummary(df, "text", merges).collect().head
    row.getLong(0) shouldBe full.length.toLong
    row.getLong(1) shouldBe full.map(_._2).sum
    row.getLong(2) shouldBe full.count(_._4).toLong
    row.getLong(3) shouldBe full.filter(_._4).map(_._2).sum
    row.getDouble(4) shouldBe
      full.filter(_._4).map(_._2).sum.toDouble / full.map(_._2).sum
    row.getDouble(5) shouldBe
      full.map(w => w._2 * w._3).sum.toDouble / full.map(_._2).sum
  }
}
