package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused BPE apply (`graft.text.BpeTokenizer`'s tokenize side): one
  * expression node carrying the frozen merge table as a codegen
  * reference object — the [[CellArgmax]] pattern — instead of the
  * nMerges-deep `replace` fold the round-13 shape used. The fold chain
  * is honest at 40 merges but collapses at a production merge count
  * (32k nodes is past what janino will compile — the exact plan-size
  * failure mode the literal-centroid assignment had); here the plan is
  * ONE node whatever the table size, and per-row cost is bounded by the
  * word length, not the merge count (see [[BpeApplier]]).
  *
  * Semantics are EXACTLY the sequential replace chain the DuckDB oracle
  * replays (rank 1..n, each one left-to-right non-overlapping pass) —
  * not the greedy lowest-rank-present loop of the usual fast BPE
  * implementations, which diverges when a later merge re-creates a pair
  * whose rank has already passed (duplicate surface forms;
  * BpeTokenizerSpec pins the divergence case). See
  * [[BpeApplier.countWordTokens]] for the equivalence argument.
  *
  * Null in → null out. Equality/hashCode compare merge-table CONTENTS
  * (the [[PqEncode]] convention) so structurally identical applies
  * canonicalize together.
  */
case class BpeTokenCount(child: Expression, merges: Array[(String, String)])
    extends UnaryExpression {

  @transient private lazy val applier = new BpeApplier(merges)

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"
  override def nullable: Boolean = true

  // analysis-time type validation (the Catalyst convention): a non-string
  // child must fail with a clear message, not a runtime ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${child.dataType.catalogString}")

  override def equals(other: Any): Boolean = other match {
    case BpeTokenCount(c, m) =>
      c == child && m.length == merges.length &&
        m.indices.forall(i => m(i) == merges(i))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(
      merges.asInstanceOf[Array[AnyRef]])

  override protected def nullSafeEval(input: Any): Any =
    applier.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApplier", applier,
      classOf[BpeApplier].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.countTokens($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  def apply(text: Column, merges: Array[(String, String)]): Column =
    GraftSqlBridge.column(
      BpeTokenCount(GraftSqlBridge.expression(text), merges))
}

/** The merge-table runtime behind [[BpeTokenCount]]: per-word sequential
  * BPE apply with a per-thread word→count cache (word frequency follows
  * a Zipf law, so the cache turns the corpus-wide cost into roughly one
  * apply per DISTINCT word per task — the standard BPE-apply memo).
  *
  * Sequential-equivalence: the oracle chain applies rank m's global
  * replace to the state left by ranks 1..m−1. [[countWordTokens]] keeps
  * a floor `cur` and repeatedly applies the SMALLEST rank > `cur` whose
  * pair is present, skipping absent ranks. Skipping is exact by
  * induction: if no rank in (cur, best) has its pair present in the
  * current state, the chain's passes for those ranks are no-ops on the
  * same state, so the state before applying `best` here equals the
  * chain's state before pass `best`. Ranks ≤ `cur` re-created later are
  * correctly ignored (their chain pass already ran) — EXCEPT when the
  * same (l, r) pair was learned again at a later rank (re-emergent
  * pairs: a merge can rebuild a multi-character left/right symbol), so
  * the rank index maps each pair to ALL its ranks and lookup takes the
  * first one above the floor.
  *
  * Each applied rank shrinks the word by ≥1 symbol, so a word of n
  * symbols costs O(n²) scans worst-case INDEPENDENT of merge count —
  * vs the chain's O(nMerges·n).
  *
  * The U+0001/U+0002 delimiter contract ([[graft.text.BpeTokenizer]])
  * is enforced HERE, where a violation can actually corrupt: the
  * delimited replace chain would silently mis-frame symbols on such
  * input while this symbol-array form would not, and the oracle replays
  * the chain — so rather than let the two engines disagree (or agree on
  * wrong counts), a document containing a reserved character fails the
  * task with a named error.
  */
final class BpeApplier(val merges: Array[(String, String)]) extends Serializable {

  import BpeApplier._

  /** pair key → ascending ranks (1-based); length-prefixed key makes
    * (l, r) unambiguous for any symbol contents. */
  @transient private lazy val ranks: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    var i = 0
    while (i < merges.length) {
      val k = pairKey(merges(i)._1, merges(i)._2)
      val prev = m.get(k)
      m.put(k, if (prev == null) Array(i + 1) else prev :+ (i + 1))
      i += 1
    }
    m
  }

  @transient private lazy val mergedForms: Array[String] =
    merges.map { case (l, r) => l + r }

  @transient private lazy val cache:
      ThreadLocal[java.util.HashMap[String, java.lang.Long]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, java.lang.Long]())

  /** BPE token count of a whole normalized document (words split on the
    * single spaces normText guarantees; each word ends in `</w>`). */
  def countTokens(norm: UTF8String): Long = {
    val s = norm.toString
    val memo = cache.get()
    var total = 0L
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val w = s.substring(start, i)
        val hit = memo.get(w)
        if (hit != null) total += hit.longValue()
        else {
          val c = countWordTokens(w).toLong
          if (memo.size < MaxCacheEntries) memo.put(w, c)
          total += c
        }
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Sequential BPE apply over one word's symbol array; returns the
    * surviving symbol count (including the `</w>` marker). */
  private[functions] def countWordTokens(word: String): Int = {
    // code-point split + end marker (matching split(w, "") + "</w>");
    // the EMPTY word splits to [""] on both engines — one empty-string
    // character, not zero symbols — so an empty document is 2 tokens
    // ("" + </w>), exactly what the delimited chain counts (spec-pinned)
    val cps = new java.util.ArrayList[String]()
    if (word.isEmpty) cps.add("")
    var ci = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      if (cp == 1 || cp == 2) throw new IllegalArgumentException(
        "BPE contract violation: input text contains a reserved delimiter " +
          "character (U+0001/U+0002) — these cannot appear in documents " +
          "fed to the BPE tokenizer (see BpeTokenizer's representation doc)")
      cps.add(word.substring(ci, ci + Character.charCount(cp)))
      ci += Character.charCount(cp)
    }
    cps.add(EndWord)
    val syms = cps.toArray(new Array[String](cps.size))
    var len = syms.length
    var cur = 0
    var done = false
    while (!done) {
      // smallest rank > cur whose pair is adjacent somewhere in the word
      var best = Int.MaxValue
      var i = 0
      while (i < len - 1) {
        val rs = ranks.get(pairKey(syms(i), syms(i + 1)))
        if (rs != null) {
          val r = firstAbove(rs, cur)
          if (r > 0 && r < best) best = r
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // one left-to-right non-overlapping pass — the chain's replace
        val l = merges(best - 1)._1
        val r = merges(best - 1)._2
        val lr = mergedForms(best - 1)
        var w = 0
        var j = 0
        while (j < len) {
          if (j < len - 1 && syms(j) == l && syms(j + 1) == r) {
            syms(w) = lr; j += 2
          } else { syms(w) = syms(j); j += 1 }
          w += 1
        }
        len = w
        cur = best
      }
    }
    len
  }
}

object BpeApplier {
  private val EndWord = "</w>"

  /** Word→count memo cap per thread: distinct-word working sets beyond
    * this just recompute (bounds executor memory on adversarial text). */
  private val MaxCacheEntries = 1 << 16

  /** Unambiguous composite key for a symbol pair. */
  private def pairKey(l: String, r: String): String =
    l.length.toString + "#" + l + r

  /** First element of ascending `rs` strictly above `cur`, or -1. */
  private def firstAbove(rs: Array[Int], cur: Int): Int = {
    var i = 0
    while (i < rs.length) { if (rs(i) > cur) return rs(i); i += 1 }
    -1
  }
}
