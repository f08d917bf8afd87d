package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  /** Sennrich et al.'s worked example: low×5, lower×2, newest×6,
    * widest×3. The first five merges are hand-computable. */
  private def corpus = Seq(
    (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
    (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
  ).toDF("doc_id", "text")

  "trainMerges" should "reproduce the hand-computed merge sequence" in {
    val m = BpeTokenizer.trainMerges(corpus, "text", nMerges = 5)
    m.map(x => (x.left, x.right, x.pair_count)) shouldBe Seq(
      // count-9 three-way tie (e,s)/(s,t)/(t,</w>) → left-asc tiebreak
      ("e", "s", 9L),
      ("es", "t", 9L),
      ("est", "</w>", 9L),
      // count-7 tie (l,o)/(o,w) → left-asc
      ("l", "o", 7L),
      ("lo", "w", 7L))
    m.map(_.merge_rank) shouldBe Seq(1, 2, 3, 4, 5)
  }

  it should "stop early when no pair repeats" in {
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    BpeTokenizer.trainMerges(tiny, "text", nMerges = 10) shouldBe empty
  }

  "tokenize" should "merge exactly the trained subwords" in {
    val m = BpeTokenizer.trainMerges(corpus, "text", nMerges = 5)
    val out = BpeTokenizer.tokenize(
      Seq((7L, "low lowest")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().head
    out.getAs[Long]("n_words") shouldBe 2L
    // low → [low, </w>]; lowest → [low, est</w>] → 4 BPE tokens
    out.getAs[Long]("n_bpe_tokens") shouldBe 4L
    out.getAs[Long]("n_chars") shouldBe 10L
    out.getAs[Double]("chars_per_token") shouldBe 2.5 +- 1e-12
  }

  it should "handle adjacent repeated pairs left-to-right (the aaa case)" in {
    // merge (a,a) on "aaa" must yield [aa, a, </w>] — leftmost
    // non-overlapping, the property the delimited representation secures
    val tr = Seq((1L, "aa aa aaa")).toDF("doc_id", "text")
    val m = BpeTokenizer.trainMerges(tr, "text", nMerges = 1)
    m.head.left shouldBe "a"
    m.head.right shouldBe "a"
    val out = BpeTokenizer.tokenize(
      Seq((1L, "aaa")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().head
    // aaa → aa a </w> → 3 symbols
    out.getAs[Long]("n_bpe_tokens") shouldBe 3L
  }

  it should "never merge across word boundaries" in {
    // merge (b,</w>) is learnable ("b" word-final); the doc "ab ba" must
    // not let patterns leak across the boundary between words
    val tr = Seq((1L, "b b b ab ab")).toDF("doc_id", "text")
    val m = BpeTokenizer.trainMerges(tr, "text", nMerges = 2)
    val out = BpeTokenizer.tokenize(
      Seq((1L, "ab ba")).toDF("doc_id", "text"), "doc_id", "text", m)
      .collect().head
    // whatever was learned, the two words tokenize independently:
    // recompute by applying per word
    val perWord = BpeTokenizer.tokenize(
      Seq((1L, "ab"), (2L, "ba")).toDF("doc_id", "text"), "doc_id", "text", m)
      .agg(sum("n_bpe_tokens")).collect().head.getLong(0)
    out.getAs[Long]("n_bpe_tokens") shouldBe perWord
  }

  it should "reduce token count versus characters on the real corpus" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = BpeTokenizer.trainMerges(docs, "text", nMerges = 20)
    m.length should be > 10
    val agg = BpeTokenizer.tokenize(docs, "doc_id", "text", m)
      .agg(sum("n_chars").as("c"), sum("n_bpe_tokens").as("t"))
      .collect().head
    // BPE compresses: fewer tokens than characters, and the trained
    // merges bite (tokens < the char+wordend count of the unmerged repr)
    agg.getLong(1).toDouble should be < agg.getLong(0) * 0.8
  }
}
