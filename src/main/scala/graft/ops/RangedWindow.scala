package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing RANGE-frame counts that survive BOTH scale bounds a plain
  * `Window.partitionBy(key).orderBy(t).rangeBetween(-f, 0)` carries:
  *
  *  1. **Parallelism = key cardinality.** With 3 lots, 3 tasks sort each
  *     lot's entire history however large the table grows — p44's
  *     low-cardinality scale-killer class. Remedy: sub-split the time
  *     axis into `numRanges` ranges ([[AsOfJoin.asOfRanged]]'s move), so
  *     the window partitions by (keys, range) with keys × numRanges
  *     tasks. Cross-range exactness comes from a distributed prefix sum
  *     (the sequencePacking pattern): per-(key, range) arrival counts —
  *     a keys × numRanges table — are prefix-summed into per-range
  *     offsets and broadcast back; each partition's local cumulative
  *     count plus its range offset IS the global cumulative count.
  *
  *  2. **O(n × frame) re-aggregation.** Spark evaluates a bounded RANGE
  *     frame by re-aggregating every row's frame from scratch
  *     (SlidingWindowFunctionFrame has no retraction), so a trailing
  *     hour over ~1200-row frames does ~1200 aggregate updates PER ROW.
  *     Remedy: the sweep identity `trailing(t) = C(t) − C(t−f−1)` where
  *     C is the cumulative arrival count — each row explodes into an
  *     arrival marker at `t` and a probe marker at `t−f−1`, one
  *     UNBOUNDED-PRECEDING range frame (incrementally evaluated, O(n))
  *     computes C at both positions, and a group-by on the row id
  *     differences them. Integer time semantics (`timeCol` is long-cast)
  *     make `(t−f−1, t]` ≡ the RANGE frame's `[t−f, t]`; probes add 0 to
  *     C, and equal order values share a frame bound, so RANGE tie
  *     semantics are preserved exactly (RangedWindowSpec pins ≡ the
  *     plain window on random data).
  *
  * Total work O(n) + two small shuffles (the (keys, range) window, the
  * row-id re-pair); every stage's parallelism is data-sized, none is
  * key-cardinality-sized. Payloads ride the explode, so project wide
  * tables to the needed columns first.
  */
object RangedWindow {

  /** `count(*)` over the trailing `[t − frame, t]` VALUE range per key,
    * appended as `out`. `timeCol` must be long-castable (epoch seconds /
    * numeric); `frame` is in the same unit. `numRanges` defaults to
    * [[Adaptive.Auto]] — derived from the row count (target
    * [[Adaptive.RowsPerRange]] rows per range) through the bounds
    * aggregate this plan already runs; exact for any value, so pinning a
    * number is purely a physical choice. */
  def trailingCount(df: DataFrame, keys: Seq[String], timeCol: String,
                    frame: Long, numRanges: Int = Adaptive.Auto,
                    out: String = "trailing_count"): DataFrame = {
    require(frame >= 0, "frame must be >= 0")
    val t = col(timeCol).cast("long")
    val b = df.agg(min(t).as("lo"), max(t).as("hi"), count(lit(1)).as("n")).head()
    if (b.isNullAt(0)) { // empty input: the plain window on nothing
      val w = Window.partitionBy(keys.map(col): _*).orderBy(t)
        .rangeBetween(-frame, Window.currentRow)
      return df.withColumn(out, count(lit(1)).over(w))
    }
    val lo = b.getLong(0)
    val span = b.getLong(1) - lo + 1
    val nRanges = Adaptive.resolveRanges(numRanges, b.getLong(2))
    val n = math.min(nRanges.toLong, span).toInt // width ≥ 1
    val width = (span + n - 1) / n
    // probes (at t − frame − 1) can fall below lo — clamp into range 0,
    // which has no lower cut, so their cumulative count stays exact
    def rng(c: Column): Column = least(lit(n - 1), greatest(lit(0),
      floor((c - lit(lo)) / lit(width)))).cast("int")

    // keys × numRanges arrival counts → DENSE per-range offsets (dense so
    // probe-only (key, range) combos still find their offset)
    val perRange = df.groupBy(keys.map(col) :+ rng(t).as("__rng"): _*)
      .agg(count(lit(1)).as("__c"))
    val offs = perRange.select(keys.map(col): _*).distinct()
      .withColumn("__rng", explode(sequence(lit(0), lit(n - 1))))
      .join(perRange, keys :+ "__rng", "left").na.fill(0L, Seq("__c"))
      .withColumn("__koff", coalesce(
        sum("__c").over(Window.partitionBy(keys.map(col): _*).orderBy("__rng")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .select(keys.map(col) :+ col("__rng") :+ col("__koff"): _*)

    // each row → arrival marker (at t) + probe marker (at t − frame − 1);
    // the id is assigned BEFORE the explode so both markers re-pair even
    // if a branch recomputes
    val tagged = df.withColumn("__rid", monotonically_increasing_id())
      .withColumn("__m", explode(array(lit(1), lit(0))))
      .withColumn("__st", when(col("__m") === 1, t).otherwise(t - lit(frame + 1)))
      .withColumn("__rng", rng(col("__st")))
    val w = Window.partitionBy((keys :+ "__rng").map(col): _*)
      .orderBy(col("__st"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = tagged.join(broadcast(offs), keys :+ "__rng")
      .withColumn("__cum",
        count(when(col("__m") === 1, lit(1))).over(w) + col("__koff"))
    // re-pair the two markers: trailing = C(t) − C(t − frame − 1). Both
    // marker rows carry identical payload columns, so first() per column
    // restores the row deterministically.
    val restore = df.columns.toSeq.map(c => first(col(c)).as(c))
    val diff = (max(when(col("__m") === 1, col("__cum")))
      - max(when(col("__m") === 0, col("__cum")))).as(out)
    cum.groupBy("__rid")
      .agg(restore.head, restore.tail :+ diff: _*)
      .drop("__rid")
  }
}
