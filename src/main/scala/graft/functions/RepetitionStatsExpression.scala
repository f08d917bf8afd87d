package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1, the
  * published repetition-removal rules every LLM curation pipeline since
  * has reused): per-document duplicate-line fractions, most-frequent
  * word n-gram coverage, and duplicated word-5-gram fraction — the
  * signals that catch boilerplate, templated spam, and scraper loops
  * that length/stopword quality proxies miss.
  *
  * One codegen node over (raw_text, normalized_text); the whole
  * computation is row-local (hash maps over one document's lines and
  * token windows), so the operator is a narrow projection with zero
  * shuffle at any corpus scale. Raw text feeds the LINE signals (the
  * normalizer collapses newlines); the house-normalized text feeds the
  * token n-gram signals so they agree with every other token-based
  * operator.
  *
  * Cross-engine contracts, each chosen to match the DuckDB twin exactly:
  * lines split on `\n` and are space-trimmed (both engines' `trim`
  * strips U+0020 only — NOT Java `String.trim`, which would also strip
  * `\r` and `\t`); character counts are CODE POINTS (DuckDB `len`);
  * n-gram tie-breaks use UTF8-binary order (DuckDB's default collation
  * and Spark's string orderBy); every fraction is one
  * integer-to-integer double division, so values verify bit-for-bit.
  *
  * Null in either input → null out.
  */
case class RepetitionStats(left: Expression, right: Expression)
    extends BinaryExpression {

  @transient private lazy val computer = new RepetitionComputer

  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"
  override def nullable: Boolean = true

  // analysis-time type validation (the Catalyst convention): a non-string
  // child must fail with a clear message, not a runtime ClassCastException
  // or a janino compile error deep in codegen
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string) inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(raw: Any, norm: Any): Any =
    computer.compute(raw.asInstanceOf[UTF8String],
      norm.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repetitionComputer", computer,
      classOf[RepetitionComputer].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RepetitionStats =
    copy(left = newLeft, right = newRight)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_dup_lines", LongType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("top_2gram", StringType, nullable = true),
    StructField("top_2gram_count", LongType, nullable = false),
    StructField("top_2gram_char_frac", DoubleType, nullable = false),
    StructField("top_3gram_char_frac", DoubleType, nullable = false),
    StructField("n_5grams", LongType, nullable = false),
    StructField("n_dup_5grams", LongType, nullable = false),
    StructField("dup_5gram_frac", DoubleType, nullable = false)))

  def apply(raw: Column, norm: Column): Column =
    GraftSqlBridge.column(RepetitionStats(
      GraftSqlBridge.expression(raw), GraftSqlBridge.expression(norm)))
}

/** The row-local signal computation behind [[RepetitionStats]] — a
  * reference object so codegen stays one call site (the [[BpeApplier]]
  * pattern), and the interpreted eval runs the identical code. */
final class RepetitionComputer extends Serializable {

  /** Strip leading/trailing U+0020 ONLY — DuckDB `trim` / Spark `trim`
    * semantics, deliberately narrower than Java's `String.trim`. */
  private def spaceTrim(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  private def cpLen(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** UTF8-binary comparison (code-point order) — matches DuckDB's
    * default collation and Spark's string sort; Java's compareTo would
    * disagree on supplementary-plane text. */
  private def utf8Compare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** (top gram, its count) over all n-token windows joined by ' ';
    * (null, 0) when fewer than n tokens. Ties break toward the
    * UTF8-smallest gram. */
  private def topGram(t: Array[String], n: Int): (String, Long) = {
    if (t.length < n) return (null, 0L)
    val counts = new java.util.HashMap[String, Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= t.length) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(t(j))
        j += 1
      }
      val g = sb.toString
      counts.put(g, counts.getOrDefault(g, 0L) + 1L)
      i += 1
    }
    var bestG: String = null
    var bestC = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > bestC || (c == bestC && utf8Compare(e.getKey, bestG) < 0)) {
        bestC = c
        bestG = e.getKey
      }
    }
    (bestG, bestC)
  }

  def compute(rawU: UTF8String, normU: UTF8String): GenericInternalRow = {
    val raw = rawU.toString
    val norm = normU.toString

    // --- line signals over the RAW text ---
    var nLines = 0L
    var lineChars = 0L
    var nDistinct = 0L
    var distinctChars = 0L
    val seen = new java.util.HashSet[String]()
    val rawLines = raw.split("\n", -1)
    var li = 0
    while (li < rawLines.length) {
      val l = spaceTrim(rawLines(li))
      if (l.nonEmpty) {
        val cp = cpLen(l)
        nLines += 1
        lineChars += cp
        if (seen.add(l)) {
          nDistinct += 1
          distinctChars += cp
        }
      }
      li += 1
    }
    val nDup = nLines - nDistinct
    val dupLineFrac =
      if (nLines == 0L) 0.0 else nDup.toDouble / nLines.toDouble
    val dupLineCharFrac =
      if (lineChars == 0L) 0.0
      else (lineChars - distinctChars).toDouble / lineChars.toDouble

    // --- token n-gram signals over the NORMALIZED text ---
    val t = norm.split(" ", -1)
    val nChars = cpLen(norm)
    val (g2, c2) = topGram(t, 2)
    val (g3, c3) = topGram(t, 3)
    def gramFrac(g: String, c: Long): Double =
      if (g == null || nChars == 0L) 0.0
      else (c * cpLen(g)).toDouble / nChars.toDouble

    val n5 = math.max(0, t.length - 4).toLong
    var dup5 = 0L
    if (n5 > 0L) {
      val seen5 = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + 5 <= t.length) {
        sb.setLength(0)
        var j = i
        while (j < i + 5) {
          if (j > i) sb.append(' ')
          sb.append(t(j))
          j += 1
        }
        if (!seen5.add(sb.toString)) dup5 += 1
        i += 1
      }
    }
    val dup5Frac = if (n5 == 0L) 0.0 else dup5.toDouble / n5.toDouble

    new GenericInternalRow(Array[Any](
      nLines, nDup, dupLineFrac, dupLineCharFrac,
      if (g2 == null) null else UTF8String.fromString(g2),
      c2, gramFrac(g2, c2), gramFrac(g3, c3),
      n5, dup5, dup5Frac))
  }
}
