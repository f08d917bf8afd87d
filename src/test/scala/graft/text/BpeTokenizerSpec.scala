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

  "trainMergesLocal" should "match the distributed trainer merge-for-merge" in {
    // the driver-side heap trainer is the default path; the distributed
    // per-merge loop is the vocab-exceeds-driver fallback. Both must
    // produce the IDENTICAL table (same counts, same utf8 tie-breaks) —
    // on the hand-computed fixture and on the real corpus.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // the empty-doc corpus exercises the empty word ("" + </w> symbols,
    // a learnable ("", </w>) pair) through BOTH trainers
    val withEmpty = corpus.union(
      Seq((98L, ""), (99L, "")).toDF("doc_id", "text"))
    for (df <- Seq(corpus, withEmpty, docs)) {
      val vocab = BpeTokenizer.vocabulary(df, "text").persist()
      val local = BpeTokenizer.trainMergesLocal(
        vocab.select("word", "freq").collect()
          .map(r => (r.getString(0), r.getLong(1))), 25)
      val dist = BpeTokenizer.trainMergesDistributed(vocab, 25)
      local shouldBe dist
      local.length should be > 4
    }
  }

  "the fused apply expression" should "equal the replace-fold chain on the real corpus" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = BpeTokenizer.trainMerges(docs, "text", nMerges = 20)
    val fused = BpeTokenizer.tokenize(docs, "doc_id", "text", m).collect()
    val chain = BpeTokenizer.tokenizeSpec(docs, "doc_id", "text", m).collect()
    fused should contain theSameElementsInOrderAs chain
  }

  it should "keep SEQUENTIAL chain semantics where greedy BPE diverges" in {
    // duplicate-surface-form table: rank 3 (b,c) fires first in rank
    // order; greedy lowest-rank-present would then merge (a,bc) [rank 1]
    // and (x,abc) [rank 2] down to 2 tokens, but the chain's passes for
    // ranks 1-2 already ran (as no-ops), so the answer is 4.
    val m = Seq(
      BpeTokenizer.Merge(1, "a", "bc", 9L),
      BpeTokenizer.Merge(2, "x", "abc", 9L),
      BpeTokenizer.Merge(3, "b", "c", 9L))
    val doc = Seq((1L, "xabc")).toDF("doc_id", "text")
    val fused = BpeTokenizer.tokenize(doc, "doc_id", "text", m).collect().head
    val chain = BpeTokenizer.tokenizeSpec(doc, "doc_id", "text", m).collect().head
    fused.getAs[Long]("n_bpe_tokens") shouldBe 4L // x, a, bc, </w>
    chain.getAs[Long]("n_bpe_tokens") shouldBe 4L
  }

  it should "apply a pair re-learned at a later rank (multi-rank pairs)" in {
    // (ab,c) appears at ranks 1 AND 3: rank 1 is a no-op (no "ab" symbol
    // yet), rank 2 creates it, rank 3 must still fire — a single-rank
    // pair index would skip it and leave 3 tokens.
    val m = Seq(
      BpeTokenizer.Merge(1, "ab", "c", 9L),
      BpeTokenizer.Merge(2, "a", "b", 9L),
      BpeTokenizer.Merge(3, "ab", "c", 9L))
    val doc = Seq((1L, "abc")).toDF("doc_id", "text")
    val fused = BpeTokenizer.tokenize(doc, "doc_id", "text", m).collect().head
    val chain = BpeTokenizer.tokenizeSpec(doc, "doc_id", "text", m).collect().head
    fused.getAs[Long]("n_bpe_tokens") shouldBe 2L // abc, </w>
    chain.getAs[Long]("n_bpe_tokens") shouldBe 2L
  }

  it should "agree with the chain on empty and whitespace-only documents" in {
    // the empty word is the one place the symbol-array and delimited-
    // string representations can diverge: split("", "") yields [""] (one
    // empty-string character) on BOTH engines, so the chain counts an
    // empty doc as ["", "</w>"] = 2 symbols — the fused applier must
    // reproduce that, not the "no code points" reading of 1
    val m = Seq(BpeTokenizer.Merge(1, "a", "b", 2L))
    val docs = Seq((1L, ""), (2L, "   "), (3L, "ab")).toDF("doc_id", "text")
    val fused = BpeTokenizer.tokenize(docs, "doc_id", "text", m).collect()
    val chain = BpeTokenizer.tokenizeSpec(docs, "doc_id", "text", m).collect()
    fused.map(_.toSeq).toSeq shouldBe chain.map(_.toSeq).toSeq
  }

  "the delimiter contract" should "surface as an error, not silent corruption" in {
    // U+0001/U+0002 in input would mis-frame the delimited replace chain
    // both engines replay — the engine must fail loudly instead
    val poisoned = Seq((1L, "ok ok ok", 0), (2L, "badword badword", 0))
      .toDF("doc_id", "text", "pad")
    val trainEx = the[IllegalArgumentException] thrownBy
      BpeTokenizer.trainMerges(poisoned, "text", nMerges = 3)
    trainEx.getMessage should include("BPE contract violation")
    val m = Seq(BpeTokenizer.Merge(1, "o", "k", 3L))
    val applyEx = intercept[Exception] {
      BpeTokenizer.tokenize(poisoned, "doc_id", "text", m).collect()
    }
    val msgs = Iterator.iterate(applyEx: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    msgs should include("reserved delimiter")
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
