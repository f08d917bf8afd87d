package graft.text

import graft.SparkSpec

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the old stone bridge " +
      "while rain falls softly on the quiet village road at dusk tonight"
  private val nearDup = base.replace("quiet village", "quiet little village")
  private val unrelated =
    "completely different content about database engines shuffle partitions " +
      "broadcast joins and adaptive query execution plans running at scale"

  private def docs = Seq(
    (1L, base),
    (2L, "  THE quick   brown fox jumps over the lazy dog near the old stone bridge " +
      "while rain falls softly on the quiet village road at dusk tonight  "),
    (3L, nearDup),
    (4L, unrelated)
  ).toDF("doc_id", "text")

  "exactDedup" should "merge case/whitespace variants and keep the min id" in {
    val out = TextDedup.exactDedup(docs, "doc_id", "text").collect()
    out.length shouldBe 3 // doc 1 and 2 normalize to the same text
    val merged = out.find(_.getAs[Long]("n_copies") == 2L).get
    merged.getAs[Long]("keep_id") shouldBe 1L
  }

  "minhashNearDup" should "find the planted near-dup pair and nothing else" in {
    val pairs = TextDedup.minhashNearDup(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((1L, 2L)) // identical after normalization, j = 1.0
    pairs should contain((1L, 3L)) // near-dup
    pairs.map(p => Set(p._1, p._2)) should not contain Set(1L, 4L)
  }

  it should "report jaccard 1.0 for texts identical after normalization" in {
    val row = TextDedup.minhashNearDup(docs, "doc_id", "text", minJaccard = 0.5)
      .filter("doc_a = 1 AND doc_b = 2").collect().head
    row.getAs[Double]("jaccard") shouldBe 1.0
  }

  "ngramJaccardPairs" should "agree with minhash on high-similarity pairs" in {
    val exact = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mh = TextDedup.minhashNearDup(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // banding can only lose pairs, never invent them, and jaccard is exact in both
    mh.subsetOf(exact) shouldBe true
    exact.map(t => (t._1, t._2)) should contain((1L, 3L))
  }

  "ngramJaccardPairs with a df cap" should "drop ultra-common shingles and lower-bound jaccard" in {
    // every shingle of docs 1/2/3 co-occurs; a df cap of 1 empties the
    // index of shared shingles → no pairs survive (jaccard lower bound 0)
    val capped = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      minJaccard = 0.5, maxShingleDf = 1)
    capped.count() shouldBe 0
    // a generous cap changes nothing on this corpus
    val loose = TextDedup.ngramJaccardPairs(docs, "doc_id", "text",
      minJaccard = 0.5, maxShingleDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = TextDedup.ngramJaccardPairs(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    loose shouldBe exact
  }

  "simhash" should "assign equal signatures to normalized-identical texts" in {
    val sigs = TextDedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sigs(1L) shouldBe sigs(2L)
    sigs(1L) should not be sigs(4L)
  }

  "simhashNearDup" should "pair the identical docs at hamming 0" in {
    val pairs = TextDedup.simhashNearDup(docs, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Long]("hamming"))).toMap
    pairs((1L, 2L)) shouldBe 0L
  }
}
