package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd rolling-gram fingerprint stats: over all `k`-codepoint windows
  * of the input string, the min and max of [[PolyHash]]'s polynomial hash
  * of each window, plus the window count — exactly
  * `transform(sequence(1, n-k+1), i -> charHash(substr(s, i, k)))` followed
  * by `array_min` / `array_max` / `size` (the HOF executable spec
  * [[graft.text.TextStats.fingerprint]] was first built from, still
  * mirrored by its DuckDB oracle), but as ONE pass over the code-point
  * array with no substring allocation and no gram array materialized at
  * all. Strings shorter than `k` yield (null, null, 0), matching
  * `array_min([]) = null` and `size([]) = 0`.
  *
  * Windows step by CODE POINT (Spark's `substr` and DuckDB's both count
  * characters), so supplementary-plane text agrees across engines.
  */
case class GramStats(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"gram_stats window must be positive, got $k")

  override def dataType: DataType = StructType(Seq(
    StructField("min_gram_hash", LongType, nullable = true),
    StructField("max_gram_hash", LongType, nullable = true),
    StructField("n_grams", LongType, nullable = false)))

  override def prettyName: String = "gram_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val (mn, mx, n) =
      GramStats.stats(input.asInstanceOf[UTF8String].toString, k)
    new GenericInternalRow(Array[Any](
      if (n == 0L) null else mn, if (n == 0L) null else mx, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val cps = ctx.freshName("cps")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val mn = ctx.freshName("mn")
      val mx = ctx.freshName("mx")
      val n = ctx.freshName("n")
      val vals = ctx.freshName("vals")
      s"""
         |String $s = $c.toString();
         |int[] $cps = $s.codePoints().toArray();
         |long $mn = Long.MAX_VALUE, $mx = Long.MIN_VALUE;
         |long $n = $cps.length < $k ? 0L : (long) ($cps.length - $k + 1);
         |for (int $i = 0; $i + $k <= $cps.length; $i++) {
         |  long $h = 7L;
         |  for (int $j = $i; $j < $i + $k; $j++) {
         |    $h = ($h * 31L + $cps[$j]) % 1000000007L;
         |  }
         |  if ($h < $mn) $mn = $h;
         |  if ($h > $mx) $mx = $h;
         |}
         |Object[] $vals = new Object[3];
         |$vals[0] = $n == 0L ? null : (Object) $mn;
         |$vals[1] = $n == 0L ? null : (Object) $mx;
         |$vals[2] = $n;
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($vals);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

object GramStats {
  /** Reference implementation (also the interpreted eval). */
  def stats(s: String, k: Int): (Long, Long, Long) = {
    val cps = s.codePoints().toArray
    if (cps.length < k) return (0L, 0L, 0L)
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var i = 0
    while (i + k <= cps.length) {
      var h = 7L
      var j = i
      while (j < i + k) {
        h = (h * 31L + cps(j)) % 1000000007L
        j += 1
      }
      if (h < mn) mn = h
      if (h > mx) mx = h
      i += 1
    }
    (mn, mx, (cps.length - k + 1).toLong)
  }

  def apply(c: Column, k: Int): Column =
    GraftSqlBridge.column(GramStats(GraftSqlBridge.expression(c), k))
}
