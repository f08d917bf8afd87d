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
  * zip_with null-padding propagates to null the same way), and so does a
  * null ELEMENT on either side (the HOF's aggregate turns any null term
  * into a null accumulator) — the element checks are emitted only when
  * the input array types admit null elements, so contract-pinned
  * non-null vectors pay nothing.
  */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"
  // length mismatch yields null even for non-null inputs
  override def nullable: Boolean = true

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(_, cn) => cn
    case _ => true
  }
  private lazy val checkNulls = elemsNullable(left) || elemsNullable(right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
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
      val nullGuard = if (checkNulls)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullGuard
         |    double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
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
