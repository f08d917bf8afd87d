package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd winnowing core over an array of token hashes: the k-gram
  * polynomial hashes and their window-of-`w` minima (Schleimer et al.
  * 2003 §4) fused into ONE generated loop pair — exactly the
  * [[TextPrims]] HOF formulation `transform(windows, min(slice(grams)))`
  * that [[graft.text.TextDedup.winnowingFingerprintsHof]] keeps as the
  * executable spec, but without a lambda frame per gram per window (the
  * dominant cost of the p158 miner at the 500k-doc ladder rung:
  * fingerprinting was ~half the wall, r14_winnowing.md). Output KEEPS
  * duplicate minima in window order — callers `array_distinct` it, so
  * the distinct-set semantics live in one place.
  *
  * Short inputs mirror the spec: fewer than `k` tokens → empty array
  * (no gram exists); fewer than `w` grams → the single min of what
  * there is (one partial window). */
case class WinnowMins(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"winnow_mins: k and w must be >= 1")

  private val P = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_mins"

  override protected def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val g = new Array[Long](m)
    var i = 0
    while (i < m) {
      var a = 7L
      var j = 0
      while (j < k) { a = (a * 31L + th.getLong(i + j)) % P; j += 1 }
      g(i) = a
      i += 1
    }
    if (m < w) {
      var mn = g(0); var t = 1
      while (t < m) { if (g(t) < mn) mn = g(t); t += 1 }
      new GenericArrayData(Array(mn))
    } else {
      val out = new Array[Long](m - w + 1)
      var p = 0
      while (p <= m - w) {
        var mn = g(p); var t = 1
        while (t < w) { if (g(p + t) < mn) mn = g(p + t); t += 1 }
        out(p) = mn
        p += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val g = ctx.freshName("g")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val p = ctx.freshName("p")
      val t = ctx.freshName("t")
      val mn = ctx.freshName("mn")
      val arrCls = classOf[GenericArrayData].getName
      s"""
         |int $n = $c.numElements();
         |long[] $out;
         |if ($n < $k) {
         |  $out = new long[0];
         |} else {
         |  int $m = $n - ${k - 1};
         |  long[] $g = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $a = 7L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      $a = ($a * 31L + $c.getLong($i + $j)) % ${P}L;
         |    }
         |    $g[$i] = $a;
         |  }
         |  if ($m < $w) {
         |    long $mn = $g[0];
         |    for (int $t = 1; $t < $m; $t++) { if ($g[$t] < $mn) $mn = $g[$t]; }
         |    $out = new long[] { $mn };
         |  } else {
         |    $out = new long[$m - ${w - 1}];
         |    for (int $p = 0; $p <= $m - $w; $p++) {
         |      long $mn = $g[$p];
         |      for (int $t = 1; $t < $w; $t++) {
         |        if ($g[$p + $t] < $mn) $mn = $g[$p + $t];
         |      }
         |      $out[$p] = $mn;
         |    }
         |  }
         |}
         |${ev.value} = new $arrCls($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

object WinnowMins {
  def apply(c: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowMins(GraftSqlBridge.expression(c), k, w))
}
