package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd packed two-hash window keys over an array of token hashes —
  * the [[TextPrims.hashedWindowKeysHof]] HOF formulation (`transform`
  * over windows of two `aggregate` folds each) as ONE generated loop
  * nest. The HOF form evaluates its fold lambdas interpreted, one frame
  * per element per window (HigherOrderFunction is CodegenFallback) —
  * measured ~16 µs/window on the 1M-doc Zipf rung, which made the
  * decontamination stage 72% of the round-16 funnel wall (1 016 s of a
  * 1 402 s 10M-doc chain; the same failure mode as round 15's
  * interpreted quality gate). The generated loop is the same integer
  * arithmetic — two polynomial folds (seed 7/mult 31/mod P, seed
  * 11/mult 37/mod P2) packed as `w1*P2 + w2`, all exact in long (w1, w2
  * < ~2^30, product < 2^63) — so outputs are bit-identical to the HOF
  * twin (WindowKeysSpec pins the equality; the DuckDB oracles replay the
  * same fold unchanged).
  *
  * Short inputs mirror the HOF spec: fewer than `k` tokens → empty
  * array. */
case class WindowKeys(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "window_keys: k must be >= 1")

  private val P = 1000000007L
  private val P2 = 998244353L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_keys"

  override protected def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var a = 7L
      var b = 11L
      var j = 0
      while (j < k) {
        val v = th.getLong(i + j)
        a = (a * 31L + v) % P
        b = (b * 37L + v) % P2
        j += 1
      }
      out(i) = a * P2 + b
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val v = ctx.freshName("v")
      val arrCls = classOf[GenericArrayData].getName
      s"""
         |int $n = $c.numElements();
         |long[] $out;
         |if ($n < $k) {
         |  $out = new long[0];
         |} else {
         |  int $m = $n - ${k - 1};
         |  $out = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $a = 7L;
         |    long $b = 11L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = $c.getLong($i + $j);
         |      $a = ($a * 31L + $v) % ${P}L;
         |      $b = ($b * 37L + $v) % ${P2}L;
         |    }
         |    $out[$i] = $a * ${P2}L + $b;
         |  }
         |}
         |${ev.value} = new $arrCls($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WindowKeys =
    copy(child = newChild)
}

object WindowKeys {
  def apply(c: Column, k: Int): Column =
    GraftSqlBridge.column(WindowKeys(GraftSqlBridge.expression(c), k))
}
