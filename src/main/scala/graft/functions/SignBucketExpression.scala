package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sign-LSH bucket of a float vector under planes
  * [firstPlane, firstPlane + nPlanes): bit j set iff the left-to-right
  * dot product with Knuth-lattice plane (firstPlane + j) is > 0 — ONE
  * codegen node replacing the nPlanes × dim interpreted-HOF dot-folds
  * of the declarative form ([[AnnPrims.signBucketHof]], kept as the
  * spec twin). At the 1M-vector miner rung the banding was 64–128
  * interpreted `aggregate(zip_with(...))` folds per vector; here it is
  * a tight JVM loop over plane arrays precomputed at plan time.
  *
  * Bit-exactness contract: each plane dot accumulates
  * `(double) v[d] * plane[d]` LEFT TO RIGHT from 0.0 — the exact IEEE
  * sequence of the HOF fold and of the DuckDB twin's list_reduce, so
  * bucket values are engine-identical.
  *
  * Null semantics replicate the HOF form exactly (it never returns
  * null): a NULL vector, a vector whose length ≠ `dim` (zip_with would
  * null-pad and poison every fold), or any NULL element (poisons every
  * fold) all yield bucket 0 — every per-plane `when(dot > 0, ...)`
  * falls to its otherwise(0). */
case class SignBucket(child: Expression, firstPlane: Int, nPlanes: Int,
                      dim: Int) extends UnaryExpression {

  require(nPlanes >= 1 && nPlanes <= 62, "nPlanes must be in [1, 62]")

  @transient private lazy val computer =
    new SignBucketComputer(firstPlane, nPlanes, dim)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "sign_bucket"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<float> input, got ${other.catalogString}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else computer.compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signBucketComputer", computer,
      classOf[SignBucketComputer].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = ${childGen.isNull} ? 0L :
        $ref.compute(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SignBucket =
    copy(child = newChild)
}

/** The row-local pass: plane components materialized once at
  * construction ([[AnnPrims.plane]]'s exact doubles), then per row one
  * left-to-right multiply-add loop per plane. */
final class SignBucketComputer(firstPlane: Int, nPlanes: Int, dim: Int)
    extends Serializable {

  private val planes: Array[Array[Double]] =
    Array.tabulate(nPlanes)(j => AnnPrims.plane(firstPlane + j, dim).toArray)

  def compute(vec: ArrayData): Long = {
    val n = vec.numElements()
    if (n != dim) return 0L // zip_with null-padding semantics
    var d = 0
    while (d < n) { // any null element poisons every fold
      if (vec.isNullAt(d)) return 0L
      d += 1
    }
    val vs = vec.toFloatArray()
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      val p = planes(j)
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += vs(i).toDouble * p(i); i += 1 }
      if (acc > 0.0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }
}
