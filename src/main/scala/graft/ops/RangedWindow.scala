package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

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
  * NULL semantics match the plain window exactly (round-8 review fix —
  * the join-based remedy used to drop null-KEY rows and zero null-TIME
  * rows): null keys group together (the per-range offsets join
  * null-safely), and null-time rows — one RANGE peer group per key,
  * sorted first, whose frame is the group itself — bypass the sweep and
  * take `count(*) over (partition by keys)` of their null-time cohort
  * directly.
  *
  * Total work O(n) + two small shuffles (the (keys, range) window, the
  * row-id re-pair); every stage's parallelism is data-sized, none is
  * key-cardinality-sized. The per-(key, range) count table is COLLECTED
  * to compute offsets (≤ |keys| × numRanges rows — this operator's
  * charter is LOW-cardinality keys; at high key cardinality use the
  * plain window, whose parallelism is already fine). Payloads ride the
  * explode, so project wide tables to the needed columns first.
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
    val spark = df.sparkSession
    val t = col(timeCol).cast("long")
    val wPlain = Window.partitionBy(keys.map(col): _*).orderBy(t)
      .rangeBetween(-frame, Window.currentRow)
    val b = df.agg(min(t).as("lo"), max(t).as("hi"), count(t).as("n")).head()
    if (b.isNullAt(0)) // empty input or all-null times: the plain window
      return df.withColumn(out, count(lit(1)).over(wPlain))
    val lo = b.getLong(0)
    val span = b.getLong(1) - lo + 1
    val nRanges = Adaptive.resolveRanges(numRanges, b.getLong(2))
    val n = math.min(nRanges.toLong, span).toInt // width ≥ 1
    val width = (span + n - 1) / n
    // probes (at t − frame − 1) can fall below lo — clamp into range 0,
    // which has no lower cut, so their cumulative count stays exact
    def rng(c: Column): Column = least(lit(n - 1), greatest(lit(0),
      floor((c - lit(lo)) / lit(width)))).cast("int")

    // null-time rows are ONE RANGE peer group per key (sorted first; the
    // frame of a null-ordered row is its peer group): their trailing
    // count is the cohort size, taken directly — they never enter the
    // sweep, whose markers assume a non-null position
    val nullT = df.filter(t.isNull)
      .withColumn(out, count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
    val main = df.filter(t.isNotNull)

    // keys × ≤numRanges arrival counts, collected (guarded: fetches at
    // most cap + 1 rows, so a high-cardinality key errors instead of
    // OOMing the driver); DENSE per-range offsets (dense so probe-only
    // (key, range) combos still find their offset) prefix-summed
    // locally — null key values ride the Rows
    val perRange = Adaptive.boundedCollect(
      main.groupBy(keys.map(col) :+ rng(t).as("__rng"): _*)
        .agg(count(lit(1)).as("__c")),
      s"trailingCount keys x ranges cardinality (${keys.mkString(", ")} x $n)",
      "the plain range window: count(*) over (partition by keys order by " +
        "time range between -frame and current row)")
    val offRows: Seq[Row] = perRange
      .groupBy(r => keys.indices.map(r.get).toList).toSeq
      .flatMap { case (kv, rows) =>
        val cnt = rows.map(r => r.getInt(keys.length) -> r.getLong(keys.length + 1)).toMap
        var acc = 0L
        (0 until n).map { g =>
          val off = acc; acc += cnt.getOrElse(g, 0L)
          // List[Any], NOT Seq(g, off): Scala would unify Int+Long to
          // Seq[Long] and silently widen g past the IntegerType schema
          Row.fromSeq(kv ++ List[Any](g, off))
        }
      }
    val offSchema = StructType(
      keys.map(k => StructField(s"__k_$k", df.schema(k).dataType)) ++
        Seq(StructField("__orng", IntegerType), StructField("__koff", LongType)))
    val offs = spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)

    // each row → arrival marker (at t) + probe marker (at t − frame − 1);
    // the id is assigned BEFORE the explode so both markers re-pair even
    // if a branch recomputes
    val tagged = main.withColumn("__rid", monotonically_increasing_id())
      .withColumn("__m", explode(array(lit(1), lit(0))))
      .withColumn("__st", when(col("__m") === 1, t).otherwise(t - lit(frame + 1)))
      .withColumn("__rng", rng(col("__st")))
    val w = Window.partitionBy((keys :+ "__rng").map(col): _*)
      .orderBy(col("__st"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    // null-SAFE key equality: a null-key cohort must find its offsets
    // exactly like any other key (plain-window GROUP semantics)
    val joinCond = (keys.map(k => col(k) <=> col(s"__k_$k")) :+
      (col("__rng") === col("__orng"))).reduce(_ && _)
    val cum = tagged.join(broadcast(offs), joinCond)
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
      .unionByName(nullT)
  }
}
