package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Fused product-quantization encoder: one pass over a float vector that
  * emits all `m` subspace codes (argmin squared-L2 against each subspace
  * codebook, ties toward the smaller code id) — the inner loop of PQ
  * encode and of every Lloyd training pass.
  *
  * Semantically identical to the declarative form it replaces (per
  * subspace: `array_min` over (l2sq, code) structs — kept as the
  * executable spec in [[graft.ann.ProductQuantizer.encodeSpec]]): the
  * distance is the same left-to-right double fold as [[L2Sq]], and
  * scanning codes in ascending order keeping strict improvements IS the
  * (d ASC, code ASC) tie order. The fusion removes the per-row
  * allocation of m×k struct wrappers and m slice copies — measured ~4×
  * on the encode-bound phases at sf0.1 (p105 Lloyd train 3.5–3.9 s →
  * 0.84–0.95 s; p105 total 5.2 → 1.8–2.0 s).
  *
  * A vector whose length differs from m·subDim returns null, like the
  * slice-fed L2Sq chain it replaces, and so does a vector carrying a null
  * ELEMENT (the [[L2Sq]] convention — the element checks are emitted only
  * when the input array type admits null elements). Codebooks ride
  * codegen as a reference object (they are driver-collected literals, a
  * few KB); equality/hashCode compare the codebook CONTENTS (not array
  * identity), so structurally identical encoders canonicalize together
  * and subexpression elimination can reuse them.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  private val m = codebooks.length
  private val k = codebooks.headOption.map(_.length).getOrElse(0)
  private val sd = codebooks.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true

  // case-class equals/hashCode would use array REFERENCE identity for the
  // codebooks field, defeating canonicalization between structurally equal
  // encoders built from different collect() calls (round-12 advice)
  override def equals(other: Any): Boolean = other match {
    case PqEncode(c, cb) =>
      c == child && java.util.Arrays.deepEquals(
        cb.asInstanceOf[Array[AnyRef]], codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]])

  private lazy val checkNulls = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != m * sd) return null
    if (checkNulls) {
      var i = 0
      while (i < m * sd) { if (v.isNullAt(i)) return null; i += 1 }
    }
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val book = codebooks(mi)
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < k) {
        val cv = book(c)
        var acc = 0.0
        var j = 0
        while (j < sd) {
          val d = v.getFloat(mi * sd + j).toDouble - cv(j).toDouble
          acc += d * d
          j += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      codes(mi) = bestC
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val cv = ctx.freshName("cv")
      val nullGuard = if (checkNulls) {
        val gi = ctx.freshName("gi")
        s"""else {
           |  for (int $gi = 0; $gi < ${m * sd}; $gi++) {
           |    if ($v.isNullAt($gi)) { ${ev.isNull} = true; break; }
           |  }
           |}""".stripMargin
      } else ""
      s"""
         |if ($v.numElements() != ${m * sd}) {
         |  ${ev.isNull} = true;
         |}
         |$nullGuard
         |if (!${ev.isNull}) {
         |  int[] $codes = new int[$m];
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    double $best = Double.POSITIVE_INFINITY;
         |    int $bestC = 0;
         |    for (int $c = 0; $c < $k; $c++) {
         |      float[] $cv = $cbRef[$mi][$c];
         |      double $acc = 0.0;
         |      for (int $j = 0; $j < $sd; $j++) {
         |        double $d = (double) $v.getFloat($mi * $sd + $j) - (double) $cv[$j];
         |        $acc += $d * $d;
         |      }
         |      if ($acc < $best) { $best = $acc; $bestC = $c; }
         |    }
         |    $codes[$mi] = $bestC;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(vec), codebooks))
}
