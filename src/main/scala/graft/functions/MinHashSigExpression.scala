package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature over an array of element hashes:
  * sig[j] = min over x of ((a_j·x + b_j) mod P), j < numHashes, with
  * a_j = (2j+1)·2654435761 mod P and b_j = (40503j+17) mod P — exactly
  * [[TextPrims.minhashSig]]'s HOF formulation and its DuckDB twin, but as
  * one fused j×x loop instead of `numHashes` interpreted array traversals
  * (the dominant cost of MinHash-LSH after the string hash moved to
  * [[PolyHash]]).
  *
  * An empty input yields an all-null signature, matching
  * `array_min(transform([], …)) = null` in the HOF spec.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  private val P = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val out = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val a = (2L * j + 1L) * 2654435761L % P
      val b = (40503L * j + 17L) % P
      var min = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * arr.getLong(i) + b) % P
        if (v < min) min = v
        i += 1
      }
      out(j) = min
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val v = ctx.freshName("v")
      val min = ctx.freshName("min")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new Object[$numHashes]);
         |} else {
         |  long[] $out = new long[$numHashes];
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $a = (2L * $j + 1L) * 2654435761L % ${P}L;
         |    long $b = (40503L * $j + 17L) % ${P}L;
         |    long $min = Long.MAX_VALUE;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $v = ($a * $c.getLong($i) + $b) % ${P}L;
         |      if ($v < $min) $min = $v;
         |    }
         |    $out[$j] = $min;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def apply(c: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(c), numHashes))
}
