package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-interval range join — with [[AsOfJoin]], the second
  * of the interval-join family Spark's built-in equi-join surface lacks.
  * Matches every point row to every interval row of the same key group
  * whose [lo, hi] (inclusive) contains the point.
  *
  * Spark-first plan via axis binning: the numeric axis is cut into
  * `binWidth` buckets; each interval EXPLODES into one row per bucket it
  * overlaps while each point maps to exactly ONE bucket, so the join is a
  * plain equi-join on (keys, bucket) followed by the residual containment
  * filter. No |P|×|I| theta-join explosion — candidates are bounded by
  * interval span / binWidth per interval — and no dedup pass is needed:
  * an interval appears at most once per bucket and a point lives in one
  * bucket, so each (point, interval) pair meets at most once. Pick
  * binWidth near the typical interval span: too small multiplies the
  * exploded index, too large widens candidate buckets (the standard
  * binned-range-join dial; both costs are linear and skew degrades into
  * shuffle-partition skew AQE already handles).
  *
  * Point and interval frames must not share non-key column names.
  */
object RangeJoin {

  /** Integer floor-division of a long axis value — NEVER through double:
    * a double cast loses precision above 2^53, which would bin rows wrong
    * and make the residual filter silently DROP true matches. pmod makes
    * the numerator an exact multiple, so the integral divide is exact
    * floor division over the full long range. */
  private def floorDiv(c: Column, w: Long): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    val exact = c.cast("long") - pmod(c.cast("long"), lit(w))
    GraftSqlBridge.column(IntegralDivide(
      GraftSqlBridge.expression(exact), GraftSqlBridge.expression(lit(w))))
  }

  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = intervals
      .filter(col(loCol) <= col(hiCol)) // degenerate intervals match nothing
      .withColumn("__bin", explode(sequence(
        floorDiv(col(loCol), binWidth), floorDiv(col(hiCol), binWidth))))
    val p = points.withColumn("__bin", floorDiv(col(pointCol), binWidth))
    p.join(binned, keys :+ "__bin")
      .filter(col(loCol) <= col(pointCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
