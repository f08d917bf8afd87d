package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextPrims._

/** Byte-pair-encoding subword tokenizer (Sennrich, Haddow & Birch 2016) —
  * train merge rules on the corpus's word vocabulary, then tokenize with
  * the frozen table: the real token accounting (p36's regex segmentation
  * is the placeholder) that feeds sequence-packing and mixture budgets.
  *
  * Representation — the portability core: a word's symbol sequence is the
  * string `⟨1⟩sym⟨2⟩⟨1⟩sym⟨2⟩…` where ⟨1⟩/⟨2⟩ are the control characters
  * U+0001/U+0002 (reserved: they cannot appear in text by contract).
  * Applying merge (l, r) is then the literal string replacement
  * `⟨1⟩l⟨2⟩⟨1⟩r⟨2⟩ → ⟨1⟩lr⟨2⟩`, and because each symbol's delimiters are
  * fully consumed by the pattern (nothing is shared between adjacent
  * matches — the naive space-separated form fails exactly there: in
  * `␣a␣b␣a␣b␣` the first `␣a␣b␣` match eats the space the second needs),
  * one left-to-right non-overlapping `replace` IS the BPE merge pass,
  * with identical results on Spark (`StringReplace`) and DuckDB
  * (`replace`). Word boundaries need no guard: a learned pair's left
  * symbol never contains the `</w>` end-marker (nothing follows it
  * inside a word), so a pattern cannot straddle two words of the
  * concatenated document string.
  *
  * Training is deterministic END-TO-END (integer pair counts, argmax
  * under (count DESC, left ASC, right ASC)) — no float wobble to
  * qualify, unlike the Lloyd trainers. It is still spec-pinned rather
  * than SQL-replayed (an iterative argmax-and-rewrite loop has no
  * recursive-CTE form: SQL recursion cannot aggregate over the working
  * table), while APPLY is oracle-verified value-exactly: the persisted
  * merge table drives a DuckDB recursive CTE that replays the identical
  * replace chain (the p50 persist-and-replay convention).
  *
  * Scale shape: training runs on the (word, freq) VOCABULARY — one
  * corpus tokenize + count, then every iteration is one pair-count
  * aggregate over the vocab frame (map-side partial to ≤ |pairs| rows
  * per task) plus a single-row argmax fetch and one row-local replace;
  * the updated vocab persists each round with a lineage-truncating
  * localCheckpoint every [[CheckpointEvery]] merges (the CC loop
  * pattern). The driver holds only the merge table (nMerges rows).
  * Apply is one narrow row-local pass: an nMerges-deep codegen'd
  * replace fold — no shuffle, no UDF, no per-row state.
  *
  * Reference scope: the reference has no tokenizer of any kind; this is
  * part of the beyond-reference LLM-pipeline surface the brief requires
  * (p36's regex token counting is the engine's own bootstrap).
  */
object BpeTokenizer {

  /** Reserved symbol delimiters (see class doc). */
  val D1 = "\u0001"
  val D2 = "\u0002"

  /** Word-end marker symbol. */
  val EndWord = "</w>"

  /** Default merge-table size for the fused query — small enough that
    * the oracle's recursive replay stays cheap, large enough that
    * multi-character subwords emerge on the test corpus. */
  val DefaultMerges = 40

  /** Lineage-truncation cadence for the training loop. */
  val CheckpointEvery = 8

  /** A trained merge rule: 1-based rank, the two symbols, and the
    * weighted pair count that won the argmax. */
  final case class Merge(merge_rank: Int, left: String, right: String,
                         pair_count: Long)

  /** One word → its initial symbol string: each character wrapped in
    * delimiters, then the end-of-word marker. */
  private def wordRepr(w: Column): Column =
    concat(
      array_join(transform(split(w, ""), c => concat(lit(D1), c, lit(D2))), ""),
      lit(D1 + EndWord + D2))

  /** Whole-document symbol string: every word's repr concatenated. */
  private def docRepr(textCol: Column): Column =
    array_join(transform(tokens(textCol), w => wordRepr(w)), "")

  /** Symbol array of a repr string: strip the outer ⟨1⟩/⟨2⟩, split on the
    * inter-symbol boundary ⟨2⟩⟨1⟩. */
  private def symsOf(repr: Column): Column =
    split(substring(repr, lit(2), length(repr) - 2), D2 + D1)

  /** The (word, freq, repr) vocabulary frame — training's working set
    * (standard BPE trains on the word dictionary, not raw text: the
    * vocabulary is orders of magnitude smaller than the corpus and the
    * frequency weight preserves exact corpus pair counts). */
  def vocabulary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("repr", wordRepr(col("word")))

  /** Train up to `nMerges` merge rules; stops early when no pair occurs
    * at least twice (merging a hapax pair compresses nothing). */
  def trainMerges(df: DataFrame, textCol: String,
                  nMerges: Int = DefaultMerges): Seq[Merge] = {
    // note: collapsing a small vocab to one partition was tried and
    // REVERTED — serializing the per-iteration aggregates cost more than
    // the scheduler floor it saved (7.7 s → 10.4 s at sf0.1)
    var vocab = vocabulary(df, textCol).persist()
    vocab.count()
    val merges = Seq.newBuilder[Merge]
    var n = 0
    var stopped = false
    while (n < nMerges && !stopped) {
      val pairs = vocab
        .select(col("freq"), symsOf(col("repr")).as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(1), size(col("s")) - 1), i =>
            struct(element_at(col("s"), i).as("l"),
              element_at(col("s"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
      // single-row bounded fetch per iteration (the Lloyd/CC pattern)
      val top = pairs.orderBy(desc("cnt"), col("l"), col("r")).limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2L) stopped = true
      else {
        val m = Merge(n + 1, top.head.getString(0), top.head.getString(1),
          top.head.getLong(2))
        merges += m
        val prev = vocab
        vocab = vocab.withColumn("repr", replace(col("repr"),
          lit(D1 + m.left + D2 + D1 + m.right + D2),
          lit(D1 + m.left + m.right + D2)))
        if ((n + 1) % CheckpointEvery == 0) vocab = vocab.localCheckpoint(true)
        else { vocab = vocab.persist(); vocab.count() }
        prev.unpersist(false)
        n += 1
      }
    }
    // release the working set: the merge table is the only output
    vocab.unpersist(false)
    merges.result()
  }

  /** Apply a frozen merge table to `textCol`: the rank-ordered replace
    * fold over the document symbol string. */
  private def applyMerges(repr: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(repr) { (c, m) =>
      replace(c,
        lit(D1 + m.left + D2 + D1 + m.right + D2),
        lit(D1 + m.left + m.right + D2))
    }

  /** Tokenize `df` with a frozen merge table (the p114 apply side):
    * per document — word count, character count of the normalized text,
    * BPE token count, and the compression ratio chars/token as one exact
    * division. Row-local throughout. */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               merges: Seq[Merge]): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      normText(col(textCol)).as("norm"))
    base.select(col("doc_id"),
        size(split(col("norm"), " ")).cast("long").as("n_words"),
        length(col("norm")).cast("long").as("n_chars"),
        size(symsOf(applyMerges(docRepr(col("norm")), merges)))
          .cast("long").as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_chars"), col("n_bpe_tokens"),
        (col("n_chars").cast("double") / col("n_bpe_tokens"))
          .as("chars_per_token"))
      .orderBy("doc_id")
  }
}
