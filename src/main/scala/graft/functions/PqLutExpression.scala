package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** The query-side half of LUT-ADC (Jégou et al. §V: the distance TABLE):
  * for a query (or query-residual) vector, the m·k array of per-subspace
  * squared distances to every codebook entry —
  * `lut[mi·k + c] = ‖q_sub(mi) − codebook[mi][c]‖²`, each partial the
  * same left-to-right double fold as [[L2Sq]]. Computed ONCE per probe
  * row (probe frames are query×nProbe sized — always tiny), after which
  * every candidate's ADC distance is m table lookups instead of a
  * dim-wide float fold: the trick that makes PQ search memory-bound
  * rather than compute-bound in production.
  *
  * Null/equality conventions follow [[PqEncode]] (length-mismatched or
  * null-element vectors → null; codebooks compared by CONTENT). */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  private lazy val m = codebooks.length
  private lazy val k = codebooks.headOption.map(_.length).getOrElse(0)
  private lazy val sd =
    codebooks.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override def nullable: Boolean = true

  override def equals(other: Any): Boolean = other match {
    case PqLut(c, cb) =>
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
    val lut = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      val book = codebooks(mi)
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
        lut(mi * k + c) = acc
        c += 1
      }
      mi += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val lut = ctx.freshName("lut")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
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
         |  double[] $lut = new double[${m * k}];
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    for (int $c = 0; $c < $k; $c++) {
         |      float[] $cv = $cbRef[$mi][$c];
         |      double $acc = 0.0;
         |      for (int $j = 0; $j < $sd; $j++) {
         |        double $d = (double) $v.getFloat($mi * $sd + $j) - (double) $cv[$j];
         |        $acc += $d * $d;
         |      }
         |      $lut[$mi * $k + $c] = $acc;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object PqLut {
  def apply(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftSqlBridge.column(PqLut(GraftSqlBridge.expression(vec), codebooks))
}

/** The candidate-side half of LUT-ADC: given a candidate's m codes and a
  * query's m·k [[PqLut]] table, the ADC distance is
  * `Σ_mi lut[mi·k + codes[mi]]` — m array lookups summed in subspace
  * order (each partial already an exact [[L2Sq]] fold, so the only
  * float contract here is the m-term left-to-right sum, which the
  * oracle mirrors with an ORDER BY m fold). m and k ride the input
  * lengths: k = |lut| / |codes|, so the expression is shape-generic.
  * Out-of-range codes or a |lut| not divisible by |codes| yield null. */
case class AdcLutSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lut_sum"
  override def nullable: Boolean = true

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  private lazy val checkNulls = elemsNullable(left) || elemsNullable(right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0) return null
    val k = lut.numElements() / m
    var s = 0.0
    var mi = 0
    while (mi < m) {
      if (checkNulls && codes.isNullAt(mi)) return null
      val c = codes.getInt(mi)
      if (c < 0 || c >= k) return null
      if (checkNulls && lut.isNullAt(mi * k + c)) return null
      s += lut.getDouble(mi * k + c)
      mi += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val codesNullGuard = if (checkNulls)
        s"if ($codes.isNullAt($mi)) { ${ev.isNull} = true; break; }"
      else ""
      val lutNullGuard = if (checkNulls)
        s"if ($lut.isNullAt($mi * $k + $c)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $m = $codes.numElements();
         |if ($m == 0 || $lut.numElements() % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = $lut.numElements() / $m;
         |  double $s = 0.0;
         |  for (int $mi = 0; $mi < $m; $mi++) {
         |    $codesNullGuard
         |    int $c = $codes.getInt($mi);
         |    if ($c < 0 || $c >= $k) { ${ev.isNull} = true; break; }
         |    $lutNullGuard
         |    $s += $lut.getDouble($mi * $k + $c);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): AdcLutSum =
    copy(left = newLeft, right = newRight)
}

object AdcLutSum {
  def apply(codes: Column, lut: Column): Column =
    GraftSqlBridge.column(
      AdcLutSum(GraftSqlBridge.expression(codes), GraftSqlBridge.expression(lut)))
}
