package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document counters behind [[graft.text.TextCuration.repetitionStats]]
  * (the C4/Gopher-style keep gate: top-token ratio, duplicate-bigram
  * fraction, symbol ratio), as ONE codegen node over the house-normalized
  * text — the [[RepetitionStats]] reference-object pattern.
  *
  * Why an expression and not the declarative struct it replaces: the
  * counter struct mixed higher-order-function folds (CodegenFallback)
  * with a regexp_replace, and the combined generate/struct fell out of
  * whole-stage codegen into fully INTERPRETED eval — thread dumps on the
  * 10M-doc funnel rehearsal showed 27/32 executor threads inside
  * java.util.regex via `RegExpReplace.nullSafeEval` (r15_funnel.md; the
  * quality gate was 71% of the funnel wall). Here the whole computation
  * is one row-local pass in plain JVM code: a token hash-count for the
  * top multiplicity, an adjacent-pair hash-set for unique bigrams, and a
  * code-point scan for the symbol/char counts — no regex, no lambdas.
  *
  * Cross-engine contracts (each chosen to keep the declarative twin and
  * the DuckDB oracle bit-identical):
  *   - tokens = `split(norm, " ")` semantics (Java regex split, limit
  *     −1): an EMPTY string yields one empty token, so n_tokens ≥ 1.
  *   - n_bigrams = max(0, n_tokens − 1); unique bigrams counted over
  *     adjacent pairs (tokens carry no spaces post-normalization, so
  *     pair identity ≡ the joined-shingle identity the twin uses).
  *   - n_sym / n_chars count CODE POINTS, `[^a-z0-9 ]` membership
  *     matching the twin's regexp_replace class.
  *
  * Null in → null out. Output: struct(n_tokens, top_cnt, n_bigrams,
  * n_uniq_bigrams, n_sym, n_chars), all longs.
  */
case class CurationStats(child: Expression) extends UnaryExpression {

  @transient private lazy val computer = new CurationStatsComputer

  override def dataType: DataType = CurationStats.schema
  override def prettyName: String = "curation_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(norm: Any): Any =
    computer.compute(norm.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("curationStatsComputer", computer,
      classOf[CurationStatsComputer].getName)
    nullSafeCodeGen(ctx, ev, n => s"${ev.value} = $ref.compute($n);")
  }

  override protected def withNewChildInternal(newChild: Expression): CurationStats =
    copy(child = newChild)
}

object CurationStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_uniq_bigrams", LongType, nullable = false),
    StructField("n_sym", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  def apply(c: Column): Column =
    GraftSqlBridge.column(CurationStats(GraftSqlBridge.expression(c)))
}

/** The row-local pass. Kept as a plain serializable class so codegen
  * references one shared instance per partition (the house pattern). */
final class CurationStatsComputer extends Serializable {

  def compute(norm: UTF8String): GenericInternalRow = {
    val s = norm.toString
    // split(" ", -1): Java regex split with trailing empties kept — the
    // exact semantics of Spark's split(norm, " ")
    val toks = s.split(" ", -1)
    val nTokens = toks.length.toLong
    val counts = new java.util.HashMap[String, Integer](toks.length * 2)
    var top = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), Integer.valueOf(1),
        (a, b) => Integer.valueOf(a.intValue + b.intValue))
      if (c.intValue > top) top = c.intValue
      i += 1
    }
    val nBigrams = math.max(0, toks.length - 1).toLong
    val bigrams = new java.util.HashSet[String](toks.length * 2)
    i = 0
    while (i < toks.length - 1) {
      bigrams.add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    var nChars = 0L
    var nSym = 0L
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      nChars += 1
      val keep = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == ' '
      if (!keep) nSym += 1
      ci += Character.charCount(cp)
    }
    new GenericInternalRow(Array[Any](nTokens, top.toLong, nBigrams,
      bigrams.size.toLong, nSym, nChars))
  }
}
