package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd SimHash over an array of token hashes: bit i of the result is
  * set iff the balance `sum over tokens of (((h >> i) % 2) * 2 - 1)` is
  * positive, for i < `bits` — exactly [[TextPrims.simhashHof]]'s
  * per-bit-aggregate formulation and its DuckDB twin, but as ONE pass over
  * the token array maintaining all `bits` balance counters, instead of
  * `bits` interpreted array traversals each paying a lambda frame per
  * token (the dominant cost of the SimHash operators after the string
  * hash moved to [[PolyHash]]).
  *
  * Token frequency weights naturally (the input is the full token list,
  * not the set). An empty array yields signature 0 (every balance is 0,
  * never positive), matching the HOF spec's empty-aggregate behavior.
  */
case class SimHashSig(child: Expression, bits: Int) extends UnaryExpression {

  require(bits > 0 && bits <= 62, s"simhash_sig bits must be in [1, 62], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val bal = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) {
        // (h >> j) % 2, not & 1: sign follows the dividend, matching the
        // SQL spec for (hypothetical) negative inputs bit-for-bit.
        bal(j) += ((h >> j) % 2L) * 2L - 1L
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (bal(j) > 0L) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val bal = ctx.freshName("bal")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |long[] $bal = new long[$bits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    $bal[$j] += (($h >> $j) % 2L) * 2L - 1L;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($bal[$j] > 0L) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def apply(c: Column, bits: Int): Column =
    GraftSqlBridge.column(SimHashSig(GraftSqlBridge.expression(c), bits))
}
