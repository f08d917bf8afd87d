package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-axis sub-split for trailing RANGE-frame windows over
  * LOW-cardinality keys — [[AsOfJoin.asOfRanged]]'s remedy applied to
  * frames. A plain `Window.partitionBy(key).orderBy(t).rangeBetween(-f, 0)`
  * has parallelism = key cardinality: with 3 lots, 3 tasks each sort the
  * lot's ENTIRE history however large the table grows — the same
  * scale-killer class p44's as-of join had.
  *
  * Plan: one tiny min/max aggregate fixes the time span; rows bucket
  * row-locally into `numRanges` ranges whose width is clamped to at least
  * one frame width (`frame + 1`), so any trailing frame spans AT MOST the
  * previous range. Rows in the last `frame` seconds of a range are
  * duplicated ONCE into the next range as helper rows (frame fillers,
  * dropped after the window), and the window partitions by (keys, range):
  * numRanges × keys sorts of |range| rows instead of key-count sorts of
  * everything. Exactness: a frame member earlier than the row's range
  * start is at most `frame` before that start, i.e. inside the previous
  * range's duplicated tail; equal order values always share a range
  * (range id is a pure function of the value), so RANGE-frame tie
  * semantics are untouched.
  */
object RangedWindow {

  /** `count(*)` over the trailing `[t - frame, t]` VALUE range per key,
    * appended as `out`. `timeCol` must be long-castable (epoch seconds /
    * numeric); `frame` is in the same unit. Falls back to the single
    * window when the data span cannot hold two frame-wide ranges. */
  def trailingCount(df: DataFrame, keys: Seq[String], timeCol: String,
                    frame: Long, numRanges: Int = 32,
                    out: String = "trailing_count"): DataFrame = {
    require(numRanges >= 1, "numRanges must be >= 1")
    require(frame >= 0, "frame must be >= 0")
    val t = col(timeCol).cast("long")
    def single: DataFrame = {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(t)
        .rangeBetween(-frame, Window.currentRow)
      df.withColumn(out, count(lit(1)).over(w))
    }
    if (numRanges == 1) return single
    val b = df.agg(min(t).as("lo"), max(t).as("hi")).head()
    if (b.isNullAt(0)) return single
    val lo = b.getLong(0)
    val span = b.getLong(1) - lo + 1
    // ranges narrower than a frame would need helpers from >1 range back;
    // clamping n keeps duplication at exactly one copy per tail row
    val n = math.min(numRanges.toLong, math.max(1L, span / (frame + 1))).toInt
    if (n <= 1) return single
    val width = (span + n - 1) / n // ceil ⇒ width ≥ span/n ≥ frame + 1
    // one pass: each row lands in its own range (__off 0) and, when it sits
    // in the last `frame` seconds of a non-final range, ALSO as a helper in
    // the next range (__off 1) — the only rows a successor frame can reach
    val assigned = df
      .withColumn("__off", explode(
        when(((t - lit(lo)) % lit(width) >= lit(width - frame)) &&
             (t - lit(lo)) / lit(width) < lit(n - 1),
          array(lit(0), lit(1))).otherwise(array(lit(0)))))
      .withColumn("__rng", ((t - lit(lo)) / lit(width) + col("__off")).cast("int"))
    val w = Window.partitionBy((keys :+ "__rng").map(col): _*)
      .orderBy(t).rangeBetween(-frame, Window.currentRow)
    assigned
      .withColumn(out, count(lit(1)).over(w))
      .filter(col("__off") === 0)
      .drop("__rng", "__off")
  }
}
