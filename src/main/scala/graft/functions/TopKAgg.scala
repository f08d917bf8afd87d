package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-capacity top-k buffer under the total order (sim DESC,
  * id ASC): a binary min-heap whose root is the WORST retained entry, so
  * admission is O(log k) and memory is exactly k (sim, id) pairs however
  * many candidate rows stream through. The comparison key is the negated
  * sim via `java.lang.Double.compare`, reproducing Spark's sort order for
  * doubles (NaN largest → ranked worst) bit-for-bit with the array_sort
  * formulation this replaces.
  */
final class TopKHeap(val k: Int) {
  val sims = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** true iff entry 1 ranks strictly worse than entry 2 under
    * (sim DESC, id ASC) with NaN sim worst. */
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(-s1, -s2)
    c > 0 || (c == 0 && i1 > i2)
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = sims(i); sims(i) = sims(j); sims(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  def add(s: Double, id: Long): Unit =
    if (n < k) {
      sims(n) = s; ids(n) = id; n += 1
      var i = n - 1
      while (i > 0 && worse(sims(i), ids(i), sims((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (k > 0 && worse(sims(0), ids(0), s, id)) {
      sims(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        // worst-at-root heap: descend toward whichever child is WORSE
        var m = i
        val l = 2 * i + 1
        val r = l + 1
        if (l < n && worse(sims(l), ids(l), sims(m), ids(m))) m = l
        if (r < n && worse(sims(r), ids(r), sims(m), ids(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

  /** Retained entries best-first — the emission order. */
  def sortedBestFirst: Array[(Long, Double)] =
    Array.range(0, n)
      .sortWith((a, b) => worse(sims(b), ids(b), sims(a), ids(a)))
      .map(i => (ids(i), sims(i)))
}

/** Bounded top-k as a [[TypedImperativeAggregate]]: per-group result is the
  * array of the k best (neighbor_id, sim) structs under (sim DESC, id ASC).
  *
  * The point is the memory shape at scale: Spark plans this as a PARTIAL
  * ObjectHashAggregate before the group shuffle and a FINAL one after, so
  * each scan task reduces its split to ≤ k entries per group — per-partition
  * memory O(k × groups), and only k-entry heaps ride the exchange. The
  * collect_list formulation this replaces materialized every candidate of a
  * (group, partition) into one array before slicing: O(partition rows) per
  * group, an executor-OOM shape at corpus scale (round-5 verdict item 3).
  * Result-identical because merging per-partition top-k heaps under a total
  * order is associative and commutative.
  */
case class TopKAgg(simExpr: Expression, idExpr: Expression, k: Int,
                   override val mutableAggBufferOffset: Int = 0,
                   override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ExpectsInputTypes {

  require(k >= 1, "topk requires k >= 1")

  // declared input types make a mistyped SQL call (`topk(float_sim, int_id,
  // k)`) fail at ANALYSIS with an implicit cast or a clear type error,
  // instead of update()'s asInstanceOf throwing at runtime.
  override def inputTypes: Seq[GraftSqlBridge.AbstractDT] = Seq(DoubleType, LongType)

  override def children: Seq[Expression] = Seq(simExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(b: TopKHeap, input: InternalRow): TopKHeap = {
    val s = simExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKHeap, o: TopKHeap): TopKHeap = {
    var i = 0
    while (i < o.n) { b.add(o.sims(i), o.ids(i)); i += 1 }
    b
  }

  override def eval(b: TopKHeap): Any =
    new GenericArrayData(b.sortedBestFirst.map { case (id, s) =>
      InternalRow(id, s): Any
    })

  override def serialize(b: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.ids(i)); bb.putDouble(b.sims(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt()
    val b = new TopKHeap(k)
    var i = 0
    while (i < m) { val id = bb.getLong(); val s = bb.getDouble(); b.add(s, id); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(simExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {
  /** `topk(sim, id, k)` as an aggregate Column. */
  def topk(sim: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(TopKAgg(GraftSqlBridge.expression(sim),
      GraftSqlBridge.expression(id), k).toAggregateExpression())
}
