package graft.text

import graft.SparkSpec

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  "stats" should "count chars, tokens and stopwords exactly" in {
    val df = Seq((1L, "The cat sat on the mat")).toDF("doc_id", "text")
    val r = TextStats.stats(df, "doc_id", "text").collect().head
    r.getAs[Long]("n_chars") shouldBe 22L
    r.getAs[Long]("n_tokens") shouldBe 6L
    r.getAs[Long]("n_unique_tokens") shouldBe 5L // "the" twice after lowering
    r.getAs[Double]("stopword_ratio") shouldBe (3.0 / 6.0) // the, on, the
  }

  it should "normalize whitespace before measuring" in {
    val df = Seq((1L, "  a   b  ")).toDF("doc_id", "text")
    val r = TextStats.stats(df, "doc_id", "text").collect().head
    r.getAs[Long]("n_chars") shouldBe 3L // "a b"
    r.getAs[Long]("n_tokens") shouldBe 2L
  }

  "langId" should "discriminate constructed language samples" in {
    val df = Seq(
      (1L, "the cat is on the mat and the dog is here"),
      (2L, "el gato esta en la casa que tiene el perro"),
      (3L, "le chat est dans les maisons une belle nuit"),
      (4L, "der hund und die katze ist im haus"),
      (5L, "xyzzy plugh quux")
    ).toDF("doc_id", "text")
    val out = TextStats.langId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("predicted_lang")).toMap
    out shouldBe Map(1L -> "en", 2L -> "es", 3L -> "fr", 4L -> "de", 5L -> "und")
  }

  "tokenCounts" should "segment letter runs, digit runs and punctuation marks" in {
    val df = Seq((1L, "GPT-2 has 1.5B params, right?")).toDF("doc_id", "text")
    val r = TextStats.tokenCounts(df, "doc_id", "text").collect().head
    // norm = "gpt-2 has 1.5b params, right?"
    r.getAs[Long]("n_ws_tokens") shouldBe 5L
    r.getAs[Long]("n_word_tokens") shouldBe 5L  // gpt, has, b, params, right
    r.getAs[Long]("n_num_tokens") shouldBe 3L   // 2, 1, 5
    r.getAs[Long]("n_punct_tokens") shouldBe 4L // - . , ?
    r.getAs[Long]("n_bpe_tokens") shouldBe 12L  // sum of the classes
  }

  it should "count the empty-ish document consistently with tokens()" in {
    val df = Seq((1L, "   ")).toDF("doc_id", "text")
    val r = TextStats.tokenCounts(df, "doc_id", "text").collect().head
    r.getAs[Long]("n_ws_tokens") shouldBe 1L // split('') convention, see PolyHash
    r.getAs[Long]("n_bpe_tokens") shouldBe 0L
  }

  "fingerprint" should "hash content and grams deterministically" in {
    val df = Seq((1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "short")).toDF("doc_id", "text")
    val rows = TextStats.fingerprint(df, "doc_id", "text").collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    byId(1L).getAs[Long]("content_hash") shouldBe byId(2L).getAs[Long]("content_hash")
    byId(1L).getAs[Long]("n_grams") shouldBe 3L // 10 chars → 3 8-grams
    byId(3L).isNullAt(byId(3L).fieldIndex("min_gram_hash")) shouldBe true
    byId(3L).getAs[Long]("n_grams") shouldBe 0L
  }

  "hashedEmbedding" should "give identical vectors to identical text and plug into cosine" in {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha beta gamma alpha"), // exact duplicate
      (3L, "totally different words here")
    ).toDF("doc_id", "text")
    val e = TextStats.hashedEmbedding(df, "doc_id", "text")
    val vs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    vs(1L) shouldBe vs(2L)
    vs(1L).length shouldBe 64
    // integer-valued floats (exact sums)
    vs.values.foreach(_.foreach(x => x shouldBe math.rint(x).toFloat))
    // cosine of the duplicate pair is exactly 1
    val sim = e.as("a").join(e.as("b"),
        col("a.vec_id") === 1L && col("b.vec_id") === 2L)
      .select(graft.functions.AnnPrims.cosine(col("a.e"), col("b.e")))
      .collect().head.getDouble(0)
    sim shouldBe 1.0 +- 1e-12 // dot/(sqrt·sqrt) of identical vectors is 1 up to the sqrt rounding
  }

  it should "zero-fill buckets no token hashes into" in {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "x")).toDF("doc_id", "text") // one token -> one bucket
    val v = TextStats.hashedEmbedding(df, "doc_id", "text")
      .collect().head.getSeq[Float](1)
    v.count(_ != 0.0f) shouldBe 1
    v.count(_ == 0.0f) shouldBe 63
  }

  "vocabGrowth" should "count each type once, at its first-appearance prefix" in {
    // ids 0..3, 2 checkpoints -> prefix 1 = docs {0,1}, prefix 2 = all.
    // Types a,b,c first appear in prefix 1; d,e only in prefix 2.
    val df = Seq((0L, "a b"), (1L, "b c"), (2L, "c d"), (3L, "a e"))
      .toDF("doc_id", "text")
    val out = TextStats.vocabGrowth(df, "doc_id", "text", nCheckpoints = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    out.toSeq shouldBe Seq(
      (1, 1L, 2L, 4L, 3L, 0.75),
      (2, 3L, 4L, 8L, 5L, 0.625))
  }

  it should "emit empty checkpoints as flat curve segments" in {
    // ids 0 and 9: with 5 checkpoints only the first and last buckets
    // receive docs — the middle ones must appear with unchanged cums.
    val df = Seq((0L, "a"), (9L, "b")).toDF("doc_id", "text")
    val out = TextStats.vocabGrowth(df, "doc_id", "text", nCheckpoints = 5)
      .collect().map(r => (r.getInt(0), r.getLong(4)))
    out.toSeq shouldBe Seq((1, 1L), (2, 1L), (3, 1L), (4, 1L), (5, 2L))
  }

  it should "reject an empty corpus and a non-positive checkpoint count" in {
    import org.apache.spark.sql.functions.col
    val df = Seq((0L, "a")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      TextStats.vocabGrowth(df.filter(col("doc_id") < 0), "doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      TextStats.vocabGrowth(df, "doc_id", "text", nCheckpoints = 0)
  }

  "langQualityGate" should "cut each language at its OWN median, where a global cut starves the low language" in {
    // lang hi: stopword-free docs, scores 0.2/0.3/0.4/0.5; lang lo:
    // stopword-heavy, scores 0.02/0.04/0.06/0.08 — every lo score sits
    // below every hi score. All scores distinct within a language.
    val docs = (0L until 8L).map { i =>
      val hi = i < 4
      val body =
        if (hi) ("word " * (40 + 20 * i.toInt)).trim
        else ("the of the of " + ("word " * (4 * (i.toInt - 3)))).trim
      (i, body, if (hi) "hi" else "lo")
    }.toDF("doc_id", "text", "lang")
    val out = TextStats.langQualityGate(docs, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    // per-language thresholds genuinely differ
    val thrByLang = out.groupBy(_._2).map { case (l, rs) => l -> rs.head._4 }
    thrByLang("hi") should be > thrByLang("lo")
    // the lower-median rule keeps scores >= the 2nd-lowest of each
    // lang's 4 distinct values: 3 kept per language, the lowest dropped
    out.filter(_._5).map(_._1).sorted shouldBe Seq(1L, 2L, 3L, 5L, 6L, 7L)
    // the same rank rule applied GLOBALLY would keep at most one lo doc
    val sortedAll = out.map(_._3).sorted
    val globalThr = sortedAll(math.max(1, math.ceil(0.5 * 8).toInt) - 1)
    out.filter(_._2 == "lo").count(_._3 >= globalThr) should be <= 1
  }
}
