package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused IVF coarse-quantizer assignment: one pass over a float vector
  * that scores every centroid by cosine and returns the argmax cell id
  * (ties toward the smaller centroid id) — the inner loop of IVF cell
  * assignment, Lloyd training, SemDeDup and the IVF-PQ coarse layer.
  *
  * This replaces the literal-inlined `array(struct(cosine(vec,
  * typedLit(cv))…))` plan (round-12's one flagged scale weakness): that
  * form builds ONE EXPRESSION NODE PER CENTROID, so at the √n rule's
  * ~10⁵ cells for a 100 TB corpus, plan construction and codegen
  * collapse long before the data does. Here the centroid matrix rides
  * codegen as a single reference object — the plan is one node
  * regardless of cell count, and assignment cost is nCells×dim fused
  * multiply-adds per row in a tight loop (no struct/array allocation
  * per row at all). Assignment stays row-local: the corpus still never
  * shuffles for it.
  *
  * Bit-compatible with the declarative spec
  * ([[graft.ann.Similarity.cellOfSpec]]): each accumulator (dot, |v|²,
  * |c|²) is the same left-to-right double fold as [[CosineSim]] — the
  * per-centroid norms are folded once at construction time in the same
  * index order, which cannot change their bits — and the scan keeps
  * strict improvements under `java.lang.Double.compare` with ties
  * broken toward the smaller centroid id, exactly `array_max` over
  * (cs, −cid) structs under Spark's total ordering.
  *
  * A vector whose length differs from the centroid dim returns null
  * (dim-pinned by the ingest contract), as does a null element when the
  * input array type admits one. Equality/hashCode compare centroid
  * CONTENTS (the [[PqEncode]] convention), so structurally identical
  * assignments canonicalize together.
  *
  * Reference scope: the reference has no vector search (SURVEY §2.10);
  * these expressions are engine infrastructure for the beyond-reference
  * ANN surface.
  */
abstract class CellScoreBase extends UnaryExpression {
  def cents: Array[(Long, Array[Float])]

  // lazy: Java deserialization (interpreted-mode task ship) constructs the
  // instance before restoring `cents`, so eager derivation would NPE
  protected lazy val nCells: Int = cents.length
  protected lazy val dim: Int = cents.headOption.map(_._2.length).getOrElse(0)
  protected lazy val ids: Array[Long] = cents.map(_._1)
  protected lazy val vecs: Array[Array[Float]] = cents.map(_._2)
  /** sqrt of each centroid's squared norm, folded left-to-right in double
    * — the exact bits CosineSim's nb accumulator yields. */
  protected lazy val sqrtNorms: Array[Double] = vecs.map { cv =>
    var nb = 0.0
    var i = 0
    while (i < cv.length) { val y = cv(i).toDouble; nb += y * y; i += 1 }
    math.sqrt(nb)
  }

  protected lazy val checkNulls: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullable: Boolean = true

  override def equals(other: Any): Boolean = other match {
    case o: CellScoreBase =>
      o.getClass == getClass && o.child == child &&
        java.util.Arrays.equals(o.ids, ids) &&
        java.util.Arrays.deepEquals(
          o.vecs.asInstanceOf[Array[AnyRef]], vecs.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + java.util.Arrays.hashCode(ids)) +
      java.util.Arrays.deepHashCode(vecs.asInstanceOf[Array[AnyRef]])

  /** Shared codegen prologue: length/null guards + the query-norm fold.
    * Returns (guardCode, naVar, sqrtNaVar). */
  protected def genPrologue(ctx: CodegenContext, ev: ExprCode,
                            v: String): (String, String) = {
    val i = ctx.freshName("i")
    val na = ctx.freshName("na")
    val x = ctx.freshName("x")
    val sqrtNa = ctx.freshName("sqrtNa")
    val nullGuard = if (checkNulls) {
      val gi = ctx.freshName("gi")
      s"""else {
         |  for (int $gi = 0; $gi < $dim; $gi++) {
         |    if ($v.isNullAt($gi)) { ${ev.isNull} = true; break; }
         |  }
         |}""".stripMargin
    } else ""
    val code =
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |}
         |$nullGuard
         |double $sqrtNa = 0.0;
         |if (!${ev.isNull}) {
         |  double $na = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $x = (double) $v.getFloat($i);
         |    $na += $x * $x;
         |  }
         |  $sqrtNa = java.lang.Math.sqrt($na);
         |}
       """.stripMargin
    (code, sqrtNa)
  }

  /** Eval-side guards + query norm; Double.NaN signals a null result. */
  protected def evalSqrtNa(v: ArrayData): Double = {
    if (v.numElements() != dim) return Double.NaN
    if (checkNulls) {
      var i = 0
      while (i < dim) { if (v.isNullAt(i)) return Double.NaN; i += 1 }
    }
    var na = 0.0
    var i = 0
    while (i < dim) { val x = v.getFloat(i).toDouble; na += x * x; i += 1 }
    math.sqrt(na)
  }

  /** Raw dot product against centroid `c` (the caller divides by the
    * norms to get the cosine). */
  protected def dotAt(v: ArrayData, c: Int): Double = {
    val cv = vecs(c)
    var dot = 0.0
    var i = 0
    while (i < dim) { dot += v.getFloat(i).toDouble * cv(i).toDouble; i += 1 }
    dot
  }
}

/** Argmax cell id over the centroid table — see [[CellScoreBase]]. */
case class CellArgmax(child: Expression, cents: Array[(Long, Array[Float])])
    extends CellScoreBase {

  override def dataType: DataType = LongType
  override def prettyName: String = "cell_argmax"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val sqrtNa = evalSqrtNa(v)
    if (sqrtNa.isNaN) return null
    var bestCs = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var c = 0
    while (c < nCells) {
      val cs = dotAt(v, c) / (sqrtNa * sqrtNorms(c))
      val cmp = java.lang.Double.compare(cs, bestCs)
      if (cmp > 0 || (cmp == 0 && ids(c) < bestId)) { bestCs = cs; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecsRef = ctx.addReferenceObj("centVecs", vecs, "float[][]")
    val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val normsRef = ctx.addReferenceObj("centNorms", sqrtNorms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val (prologue, sqrtNa) = genPrologue(ctx, ev, v)
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val cs = ctx.freshName("cs")
      val cmp = ctx.freshName("cmp")
      val bestCs = ctx.freshName("bestCs")
      val bestId = ctx.freshName("bestId")
      val cv = ctx.freshName("cv")
      s"""
         |$prologue
         |if (!${ev.isNull}) {
         |  double $bestCs = Double.NEGATIVE_INFINITY;
         |  long $bestId = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $nCells; $c++) {
         |    float[] $cv = $vecsRef[$c];
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $dot += (double) $v.getFloat($j) * (double) $cv[$j];
         |    }
         |    double $cs = $dot / ($sqrtNa * $normsRef[$c]);
         |    int $cmp = java.lang.Double.compare($cs, $bestCs);
         |    if ($cmp > 0 || ($cmp == 0 && $idsRef[$c] < $bestId)) {
         |      $bestCs = $cs; $bestId = $idsRef[$c];
         |    }
         |  }
         |  ${ev.value} = $bestId;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CellArgmax =
    copy(child = newChild)
}

object CellArgmax {
  def apply(vec: Column, cents: Array[(Long, Array[Float])]): Column =
    GraftSqlBridge.column(CellArgmax(GraftSqlBridge.expression(vec), cents))
}

/** The `nProbe` best cell ids ordered by (cosine DESC, cent_id ASC) — the
  * probe list of an IVF search, fused the same way as [[CellArgmax]]
  * (one reference-object centroid table, a bounded insertion selection
  * per row instead of sort-reverse-slice over a literal struct array).
  * Returns min(nProbe, nCells) ids; see [[CellScoreBase]] for the
  * bit-compat and null conventions. */
case class CellProbes(child: Expression, cents: Array[(Long, Array[Float])],
                      nProbe: Int) extends CellScoreBase {

  private lazy val outN = math.min(nProbe, nCells)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cell_probes"

  override def equals(other: Any): Boolean = other match {
    case o: CellProbes => super.equals(o) && o.nProbe == nProbe
    case _ => false
  }
  override def hashCode(): Int = 31 * super.hashCode() + nProbe

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val sqrtNa = evalSqrtNa(v)
    if (sqrtNa.isNaN) return null
    val topCs = Array.fill(outN)(Double.NegativeInfinity)
    val topId = Array.fill(outN)(Long.MaxValue)
    var c = 0
    while (c < nCells) {
      val cs = dotAt(v, c) / (sqrtNa * sqrtNorms(c))
      val cid = ids(c)
      var pos = outN
      while (pos > 0 && {
        val cmp = java.lang.Double.compare(cs, topCs(pos - 1))
        cmp > 0 || (cmp == 0 && cid < topId(pos - 1))
      }) pos -= 1
      if (pos < outN) {
        var q = outN - 1
        while (q > pos) { topCs(q) = topCs(q - 1); topId(q) = topId(q - 1); q -= 1 }
        topCs(pos) = cs; topId(pos) = cid
      }
      c += 1
    }
    new GenericArrayData(topId)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecsRef = ctx.addReferenceObj("centVecs", vecs, "float[][]")
    val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val normsRef = ctx.addReferenceObj("centNorms", sqrtNorms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val (prologue, sqrtNa) = genPrologue(ctx, ev, v)
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val cs = ctx.freshName("cs")
      val cid = ctx.freshName("cid")
      val cmp = ctx.freshName("cmp")
      val topCs = ctx.freshName("topCs")
      val topId = ctx.freshName("topId")
      val pos = ctx.freshName("pos")
      val q = ctx.freshName("q")
      val cv = ctx.freshName("cv")
      s"""
         |$prologue
         |if (!${ev.isNull}) {
         |  double[] $topCs = new double[$outN];
         |  long[] $topId = new long[$outN];
         |  java.util.Arrays.fill($topCs, Double.NEGATIVE_INFINITY);
         |  java.util.Arrays.fill($topId, Long.MAX_VALUE);
         |  for (int $c = 0; $c < $nCells; $c++) {
         |    float[] $cv = $vecsRef[$c];
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $dot += (double) $v.getFloat($j) * (double) $cv[$j];
         |    }
         |    double $cs = $dot / ($sqrtNa * $normsRef[$c]);
         |    long $cid = $idsRef[$c];
         |    int $pos = $outN;
         |    while ($pos > 0) {
         |      int $cmp = java.lang.Double.compare($cs, $topCs[$pos - 1]);
         |      if ($cmp > 0 || ($cmp == 0 && $cid < $topId[$pos - 1])) { $pos--; }
         |      else break;
         |    }
         |    if ($pos < $outN) {
         |      for (int $q = $outN - 1; $q > $pos; $q--) {
         |        $topCs[$q] = $topCs[$q - 1]; $topId[$q] = $topId[$q - 1];
         |      }
         |      $topCs[$pos] = $cs; $topId[$pos] = $cid;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($topId);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CellProbes =
    copy(child = newChild)
}

object CellProbes {
  def apply(vec: Column, cents: Array[(Long, Array[Float])], nProbe: Int): Column =
    GraftSqlBridge.column(
      CellProbes(GraftSqlBridge.expression(vec), cents, nProbe))
}

/** Argmax cell id AND the residual against that cell's centroid, in one
  * pass: struct(cell, r) with r(i) = v(i) − centroid(i) as exact float32
  * subtraction — the front half of residual product quantization (Jégou
  * et al.'s by_residual mode), fused so the corpus pays neither a
  * second scoring pass nor a centroid join. Same bit-compat, null and
  * equality conventions as [[CellArgmax]] (see [[CellScoreBase]]); the
  * float32 difference is exactly replayable in SQL as
  * CAST(CAST(x AS DOUBLE) − CAST(c AS DOUBLE) AS REAL) since a float
  * difference computed in double rounds to the identical float. */
case class CellResidual(child: Expression, cents: Array[(Long, Array[Float])])
    extends CellScoreBase {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cell", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("r",
      ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "cell_residual"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val sqrtNa = evalSqrtNa(v)
    if (sqrtNa.isNaN) return null
    var bestCs = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var bestIdx = -1
    var c = 0
    while (c < nCells) {
      val cs = dotAt(v, c) / (sqrtNa * sqrtNorms(c))
      val cmp = java.lang.Double.compare(cs, bestCs)
      if (cmp > 0 || (cmp == 0 && ids(c) < bestId)) {
        bestCs = cs; bestId = ids(c); bestIdx = c
      }
      c += 1
    }
    val cv = vecs(bestIdx)
    val r = new Array[Float](dim)
    var i = 0
    while (i < dim) { r(i) = v.getFloat(i) - cv(i); i += 1 }
    org.apache.spark.sql.catalyst.InternalRow(bestId, new GenericArrayData(r))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecsRef = ctx.addReferenceObj("centVecs", vecs, "float[][]")
    val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val normsRef = ctx.addReferenceObj("centNorms", sqrtNorms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val (prologue, sqrtNa) = genPrologue(ctx, ev, v)
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val cs = ctx.freshName("cs")
      val cmp = ctx.freshName("cmp")
      val bestCs = ctx.freshName("bestCs")
      val bestId = ctx.freshName("bestId")
      val bestIdx = ctx.freshName("bestIdx")
      val cv = ctx.freshName("cv")
      val res = ctx.freshName("res")
      val row = ctx.freshName("row")
      s"""
         |$prologue
         |if (!${ev.isNull}) {
         |  double $bestCs = Double.NEGATIVE_INFINITY;
         |  long $bestId = Long.MAX_VALUE;
         |  int $bestIdx = -1;
         |  for (int $c = 0; $c < $nCells; $c++) {
         |    float[] $cv = $vecsRef[$c];
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $dot += (double) $v.getFloat($j) * (double) $cv[$j];
         |    }
         |    double $cs = $dot / ($sqrtNa * $normsRef[$c]);
         |    int $cmp = java.lang.Double.compare($cs, $bestCs);
         |    if ($cmp > 0 || ($cmp == 0 && $idsRef[$c] < $bestId)) {
         |      $bestCs = $cs; $bestId = $idsRef[$c]; $bestIdx = $c;
         |    }
         |  }
         |  float[] $res = new float[$dim];
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $res[$j] = $v.getFloat($j) - $vecsRef[$bestIdx][$j];
         |  }
         |  Object[] $row = new Object[] { $bestId,
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($res) };
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($row);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CellResidual =
    copy(child = newChild)
}

object CellResidual {
  def apply(vec: Column, cents: Array[(Long, Array[Float])]): Column =
    GraftSqlBridge.column(CellResidual(GraftSqlBridge.expression(vec), cents))
}
