package graft.text

import graft.SparkSpec

/** [[TextStats.collocations]] and [[TextStats.tfidfKeywords]] — each
  * pinned against an independent sequential reference on a hand corpus
  * plus a random corpus, with the score arithmetic recomputed exactly
  * (both scores are single correctly-rounded double divisions of exact
  * integer products, so `shouldBe` without tolerance is the point). */
class KeywordMiningSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")

  // --- collocations ---

  private def refCollocations(texts: Seq[String], minCount: Int, topK: Int)
      : Seq[(String, String, Long, Long, Long, Double)] = {
    val bigrams = texts.map(norm).map(_.split(" ").toSeq).filter(_.size >= 2)
      .flatMap(t => t.zip(t.drop(1)))
    val c12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n1 = c12.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val n2 = c12.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val total = c12.values.sum
    c12.toSeq.collect { case ((w1, w2), c) if c >= minCount =>
      (w1, w2, c, n1(w1), n2(w2),
        c.toDouble * total / (n1(w1) * n2(w2)))
    }.sortBy { case (w1, w2, _, _, _, r) => (-r, w1, w2) }.take(topK)
  }

  "collocations" should "match the sequential PMI reference on a hand corpus" in {
    // "new york" always adjacent (high PMI), "the cat"/"the dog" split
    // "the"'s left mass (low PMI)
    val texts = Seq.fill(6)("the cat saw new york") ++
      Seq.fill(6)("the dog left new york") ++
      Seq.fill(5)("a cat and a dog met")
    val got = TextStats.collocations(
        texts.zipWithIndex.map(_.swap).toDF("doc_id", "text"),
        "text", minCount = 5, topK = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    got shouldBe refCollocations(texts, 5, 10)
    // the always-adjacent pair is mined, and with the hand-computable
    // ratio: c12=12, left(new)=12, right(york)=12 → 12·N/144 = N/12
    val totalPairs = got.map(_._3).sum // only a sanity lower bound
    val ny = got.find(r => r._1 == "new" && r._2 == "york").get
    ny._3 shouldBe 12L
    ny._6 shouldBe 12.0 * (6 * 4 + 6 * 4 + 5 * 5) / (12 * 12)
    totalPairs should be > 0L
  }

  it should "match the reference on a random corpus" in {
    val rnd = new scala.util.Random(142)
    val vocab = Vector("red", "blue", "green", "fast", "slow", "car", "bike")
    val texts = (0 until 80).map(_ =>
      (0 until (5 + rnd.nextInt(20))).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    val got = TextStats.collocations(
        texts.zipWithIndex.map(_.swap).toDF("doc_id", "text"),
        "text", minCount = 3, topK = 15)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    got shouldBe refCollocations(texts, 3, 15)
  }

  // --- tfidfKeywords ---

  private def refKeywords(docs: Seq[(Long, String)], k: Int)
      : Seq[(Long, Int, String, Long, Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> norm(t).split(" ").toSeq }
    val tf = toks.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, o) => (id, w, o.size.toLong) } }
    val df = tf.groupBy(_._2).map { case (w, rows) => w -> rows.size.toLong }
    val nDocs = docs.size.toLong
    tf.map { case (id, w, f) =>
        (id, w, f, df(w), f.toDouble * nDocs / df(w)) }
      .groupBy(_._1).toSeq.flatMap { case (id, rows) =>
        rows.sortBy { case (_, w, _, _, s) => (-s, w) }.take(k).zipWithIndex
          .map { case ((_, w, f, d, s), i) => (id, i + 1, w, f, d, s) }
      }.sortBy(r => (r._1, r._2))
  }

  "tfidfKeywords" should "match the sequential reference and rank rare terms first" in {
    val docs = Seq(
      1L -> "shared shared shared unique1 unique1",
      2L -> "shared shared unique2",
      3L -> "shared unique3 unique3 unique3")
    val got = TextStats.tfidfKeywords(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    got shouldBe refKeywords(docs, 2)
    // every doc's top term is its df=1 unique token, not the df=3 shared
    got.filter(_._2 == 1).map(_._3).toSet shouldBe
      Set("unique1", "unique2", "unique3")
  }

  it should "match the reference on a random corpus" in {
    val rnd = new scala.util.Random(143)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0L until 50L).map(id =>
      id -> (0 until (3 + rnd.nextInt(15)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val got = TextStats.tfidfKeywords(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    got shouldBe refKeywords(docs, 3)
  }

  // --- cellTopTerms (c-TF-IDF labels) ---

  /** Sequential c-TF-IDF reference: per cell, top-k terms by tf·C/cf. */
  private def refCellTerms(docs: Seq[(Long, String)], cells: Map[Long, Long],
                           k: Int): Seq[(Long, Int, String, Long, Long, Double)] = {
    val tf = docs.flatMap { case (id, t) =>
        norm(t).split(" ").map(w => (cells(id), w)) }
      .groupBy(identity).map { case (key, v) => key -> v.size.toLong }
    val cf = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val nCells = tf.keys.map(_._1).toSet.size.toLong
    tf.toSeq.map { case ((cell, w), f) =>
        (cell, w, f, cf(w), f.toDouble * nCells / cf(w)) }
      .groupBy(_._1).toSeq.flatMap { case (cell, rows) =>
        rows.sortBy { case (_, w, _, _, s) => (-s, w) }.take(k).zipWithIndex
          .map { case ((_, w, f, c, s), i) => (cell, i + 1, w, f, c, s) }
      }.sortBy(r => (r._1, r._2))
  }

  "cellTopTerms" should "label each cell by its characteristic terms, not shared vocabulary" in {
    val docs = Seq(
      0L -> "the market rose and the market fell",
      1L -> "the traders sold the market short",
      2L -> "the striker scored and the keeper saved",
      3L -> "the match ended and the striker cried")
    val cells = Map(0L -> 10L, 1L -> 10L, 2L -> 20L, 3L -> 20L)
    val cellsDf = cells.toSeq.toDF("vec_id", "cell")
    val got = TextStats.cellTopTerms(docs.toDF("doc_id", "text"),
        "doc_id", "text", cellsDf, k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    got shouldBe refCellTerms(docs, cells, 2)
    // each cell's top term is cell-specific ("market"/"striker"), never
    // the cross-cell "the"/"and"
    got.filter(_._2 == 1).map(r => (r._1, r._3)).toSet shouldBe
      Set((10L, "market"), (20L, "striker"))
  }

  it should "match the reference on a random clustered corpus" in {
    val rnd = new scala.util.Random(154)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    val docs = (0L until 60L).map(id =>
      id -> (0 until (3 + rnd.nextInt(12)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val cells = docs.map { case (id, _) => id -> (id % 4) }.toMap
    val got = TextStats.cellTopTerms(docs.toDF("doc_id", "text"),
        "doc_id", "text", cells.toSeq.toDF("vec_id", "cell"), k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    got shouldBe refCellTerms(docs, cells, 3)
  }
}
