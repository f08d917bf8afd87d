package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd squared Euclidean distance between two float-vector columns —
  * the inner loop of product-quantization encode (argmin over codebook
  * entries) and ADC search (query vs decoded reconstruction).
  *
  * Bit-compatible with [[AnnPrims.l2sqHof]] and the DuckDB oracle: the
  * accumulator is summed left-to-right in double with float→double casts
  * per element ((x−y)² per index, in index order), the same convention as
  * [[CosineSim]]. Length-mismatched inputs return null (the HOF spec's
  * zip_with null-padding propagates to null the same way).
  */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"
  // length mismatch yields null even for non-null inputs
  override def nullable: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

object L2Sq {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      L2Sq(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
