package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Two-level IVF coarse assignment (the production cut past ~10⁴ cells
  * named in bench_records/r13_ann_cells.md): score `wSuper` best
  * SUPERCLUSTERS by cosine, then argmax only over those superclusters'
  * cells — per-row cost O((nSuper + wSuper·nCells/nSuper)·dim) instead
  * of [[CellArgmax]]'s O(nCells·dim), i.e. ~O(√nCells·dim) at the
  * √-sized supercluster layer. The flat scan is exact; this one is the
  * standard approximation (the true argmax cell can live in an unprobed
  * supercluster), with agreement measured on the ladder
  * (bench_records/r14_two_level.md) and the assignment itself
  * oracle-replayed value-exactly from the persisted supercluster +
  * cell-mapping artifacts (p125).
  *
  * Bit-compat follows [[CellScoreBase]]: every cosine is the same
  * left-to-right double fold; supercluster selection keeps the best
  * `wSuper` under (cos DESC, sid ASC) (the [[CellProbes]] insertion
  * scan); the cell argmax breaks ties toward the smaller cell id. Both
  * tables ride codegen as reference objects — plan size constant in
  * both counts. The reference-object FOOTPRINT still holds every cell
  * vector (~25 MB at 10⁵×64f — fine for an executor); it is the per-row
  * arithmetic that stops growing linearly.
  *
  * Null conventions as [[CellArgmax]]: dim mismatch or null element →
  * null. Equality/hashCode compare table CONTENTS.
  *
  * Reference scope: the reference has no vector search (SURVEY §2.10);
  * engine infrastructure for the beyond-reference ANN surface.
  */
case class CellArgmaxNested(child: Expression,
                            supers: Array[(Long, Array[Float])],
                            cells: Array[(Long, Long, Array[Float])],
                            wSuper: Int) extends UnaryExpression {

  @transient private lazy val nSuper: Int = supers.length
  @transient private lazy val dim: Int =
    supers.headOption.map(_._2.length).getOrElse(0)
  @transient private lazy val supIds: Array[Long] = supers.map(_._1)
  @transient private lazy val supVecs: Array[Array[Float]] = supers.map(_._2)
  @transient private lazy val cellIds: Array[Long] = cells.map(_._1)
  @transient private lazy val cellVecs: Array[Array[Float]] = cells.map(_._3)
  /** groups(si) = indices into the cell arrays of the cells mapped to
    * supers(si). */
  @transient private lazy val groups: Array[Array[Int]] = {
    val bySid = cells.indices.groupBy(i => cells(i)._2)
    supers.map { case (sid, _) => bySid.getOrElse(sid, Seq.empty).toArray }
  }
  private def norms(vs: Array[Array[Float]]): Array[Double] = vs.map { cv =>
    var nb = 0.0
    var i = 0
    while (i < cv.length) { val y = cv(i).toDouble; nb += y * y; i += 1 }
    math.sqrt(nb)
  }
  @transient private lazy val supNorms: Array[Double] = norms(supVecs)
  @transient private lazy val cellNorms: Array[Double] = norms(cellVecs)
  @transient private lazy val outW: Int = math.min(wSuper, nSuper)
  @transient private lazy val checkNulls: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "cell_argmax_nested"
  override def nullable: Boolean = true

  override def equals(other: Any): Boolean = other match {
    case o: CellArgmaxNested =>
      o.child == child && o.wSuper == wSuper &&
        o.supers.length == supers.length && o.cells.length == cells.length &&
        o.supers.indices.forall(i => o.supers(i)._1 == supers(i)._1 &&
          java.util.Arrays.equals(o.supers(i)._2, supers(i)._2)) &&
        o.cells.indices.forall(i => o.cells(i)._1 == cells(i)._1 &&
          o.cells(i)._2 == cells(i)._2 &&
          java.util.Arrays.equals(o.cells(i)._3, cells(i)._3))
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * (31 * child.hashCode() + wSuper) +
      java.util.Arrays.hashCode(supers.map(_._1))) +
      java.util.Arrays.hashCode(cells.map(_._1))

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    if (checkNulls) {
      var i = 0
      while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    }
    var na = 0.0
    var i = 0
    while (i < dim) { val x = v.getFloat(i).toDouble; na += x * x; i += 1 }
    val sqrtNa = math.sqrt(na)
    // top-w superclusters (cos DESC, sid ASC) — the CellProbes scan
    val topCs = Array.fill(outW)(Double.NegativeInfinity)
    val topIdx = Array.fill(outW)(-1)
    var s = 0
    while (s < nSuper) {
      val sv = supVecs(s)
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += v.getFloat(j).toDouble * sv(j).toDouble; j += 1 }
      val cs = dot / (sqrtNa * supNorms(s))
      val sid = supIds(s)
      var pos = outW
      while (pos > 0 && {
        val cmp = java.lang.Double.compare(cs, topCs(pos - 1))
        cmp > 0 || (cmp == 0 && topIdx(pos - 1) >= 0 &&
          sid < supIds(topIdx(pos - 1)))
      }) pos -= 1
      if (pos < outW) {
        var q = outW - 1
        while (q > pos) { topCs(q) = topCs(q - 1); topIdx(q) = topIdx(q - 1); q -= 1 }
        topCs(pos) = cs; topIdx(pos) = s
      }
      s += 1
    }
    // argmax over the selected superclusters' cells
    var bestCs = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var w = 0
    while (w < outW) {
      val si = topIdx(w)
      if (si >= 0) {
        val g = groups(si)
        var gi = 0
        while (gi < g.length) {
          val ci = g(gi)
          val cv = cellVecs(ci)
          var dot = 0.0
          var j = 0
          while (j < dim) { dot += v.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
          val cs = dot / (sqrtNa * cellNorms(ci))
          val cmp = java.lang.Double.compare(cs, bestCs)
          if (cmp > 0 || (cmp == 0 && cellIds(ci) < bestId)) {
            bestCs = cs; bestId = cellIds(ci)
          }
          gi += 1
        }
      }
      w += 1
    }
    if (bestId == Long.MaxValue) null else bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val supVecsRef = ctx.addReferenceObj("supVecs", supVecs, "float[][]")
    val supIdsRef = ctx.addReferenceObj("supIds", supIds, "long[]")
    val supNormsRef = ctx.addReferenceObj("supNorms", supNorms, "double[]")
    val cellVecsRef = ctx.addReferenceObj("cellVecs", cellVecs, "float[][]")
    val cellIdsRef = ctx.addReferenceObj("cellIds", cellIds, "long[]")
    val cellNormsRef = ctx.addReferenceObj("cellNorms", cellNorms, "double[]")
    val groupsRef = ctx.addReferenceObj("groups", groups, "int[][]")
    nullSafeCodeGen(ctx, ev, v => {
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
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val cs = ctx.freshName("cs")
      val sv = ctx.freshName("sv")
      val sid = ctx.freshName("sid")
      val pos = ctx.freshName("pos")
      val q = ctx.freshName("q")
      val cmp = ctx.freshName("cmp")
      val topCs = ctx.freshName("topCs")
      val topIdx = ctx.freshName("topIdx")
      val bestCs = ctx.freshName("bestCs")
      val bestId = ctx.freshName("bestId")
      val w = ctx.freshName("w")
      val si = ctx.freshName("si")
      val g = ctx.freshName("g")
      val gi2 = ctx.freshName("gi2")
      val ci = ctx.freshName("ci")
      val cv = ctx.freshName("cv")
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |}
         |$nullGuard
         |if (!${ev.isNull}) {
         |  double $na = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $x = (double) $v.getFloat($i);
         |    $na += $x * $x;
         |  }
         |  double $sqrtNa = java.lang.Math.sqrt($na);
         |  double[] $topCs = new double[$outW];
         |  int[] $topIdx = new int[$outW];
         |  java.util.Arrays.fill($topCs, Double.NEGATIVE_INFINITY);
         |  java.util.Arrays.fill($topIdx, -1);
         |  for (int $s = 0; $s < $nSuper; $s++) {
         |    float[] $sv = $supVecsRef[$s];
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $dot += (double) $v.getFloat($j) * (double) $sv[$j];
         |    }
         |    double $cs = $dot / ($sqrtNa * $supNormsRef[$s]);
         |    long $sid = $supIdsRef[$s];
         |    int $pos = $outW;
         |    while ($pos > 0) {
         |      int $cmp = java.lang.Double.compare($cs, $topCs[$pos - 1]);
         |      if ($cmp > 0 || ($cmp == 0 && $topIdx[$pos - 1] >= 0 &&
         |          $sid < $supIdsRef[$topIdx[$pos - 1]])) { $pos--; }
         |      else break;
         |    }
         |    if ($pos < $outW) {
         |      for (int $q = $outW - 1; $q > $pos; $q--) {
         |        $topCs[$q] = $topCs[$q - 1]; $topIdx[$q] = $topIdx[$q - 1];
         |      }
         |      $topCs[$pos] = $cs; $topIdx[$pos] = $s;
         |    }
         |  }
         |  double $bestCs = Double.NEGATIVE_INFINITY;
         |  long $bestId = Long.MAX_VALUE;
         |  for (int $w = 0; $w < $outW; $w++) {
         |    int $si = $topIdx[$w];
         |    if ($si >= 0) {
         |      int[] $g = $groupsRef[$si];
         |      for (int $gi2 = 0; $gi2 < $g.length; $gi2++) {
         |        int $ci = $g[$gi2];
         |        float[] $cv = $cellVecsRef[$ci];
         |        double $dot = 0.0;
         |        for (int $j = 0; $j < $dim; $j++) {
         |          $dot += (double) $v.getFloat($j) * (double) $cv[$j];
         |        }
         |        double $cs = $dot / ($sqrtNa * $cellNormsRef[$ci]);
         |        int $cmp = java.lang.Double.compare($cs, $bestCs);
         |        if ($cmp > 0 || ($cmp == 0 && $cellIdsRef[$ci] < $bestId)) {
         |          $bestCs = $cs; $bestId = $cellIdsRef[$ci];
         |        }
         |      }
         |    }
         |  }
         |  if ($bestId == Long.MAX_VALUE) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $bestId; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CellArgmaxNested =
    copy(child = newChild)
}

object CellArgmaxNested {
  def apply(vec: Column, supers: Array[(Long, Array[Float])],
            cells: Array[(Long, Long, Array[Float])], wSuper: Int): Column =
    GraftSqlBridge.column(
      CellArgmaxNested(GraftSqlBridge.expression(vec), supers, cells, wSuper))
}
