package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (most-recent-at-or-before) join — an operator Spark's
  * built-in join set lacks (the reference has nothing close either; its
  * nearest relative is the entry/exit pairing, SURVEY §2.3 J2).
  *
  * For every left row, attaches the payload of the LATEST right row whose
  * time is ≤ (or strictly < when `strict`) the left row's time, within
  * the same key group; left rows with no qualifying right row keep null
  * payload (left-outer semantics).
  *
  * Spark-first plan instead of a range/theta join: both sides union into
  * one frame tagged by side, then ONE hash-shuffle on the keys and ONE
  * within-partition sort by (time, tag) feed a running
  * `last(payload, ignoreNulls)` window — each left row reads the most
  * recent right payload seen so far in sort order. Cost is shuffle+sort
  * of |L|+|R| rows: no candidate-pair explosion (a naive time-inequality
  * join materializes |L|×|R| rows per key before picking the max), no
  * per-row subquery, and key skew degrades into ordinary shuffle-partition
  * skew that AQE handles. The tie boundary is exact by construction, not
  * ordering luck: at equal time, right rows sort before left for ≤
  * semantics and after left under `strict`.
  *
  * Parallelism bound, stated honestly: the window partitions by the keys,
  * so max parallelism = key cardinality. Natural as-of keys (symbol,
  * user, document) are high-cardinality and scale out; for a
  * low-cardinality key over a huge history (p44's 3 lots at corpus
  * scale), sub-split the time axis into ranges carrying the last right
  * row of the previous range as a seed snapshot, then run this operator
  * per range — same semantics, range-count × key-count parallelism.
  *
  * `leftTime`/`rightTime` must be mutually comparable (both timestamps,
  * or both zero-padded time strings); payload names must not collide with
  * left columns; (keys, rightTime) should uniquely identify a right row —
  * with duplicate right times the attached payload is whichever duplicate
  * the within-partition sort visits last (snapshot series like p44's
  * hourly occupancy satisfy uniqueness by construction).
  */
object AsOfJoin {
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, payload: Seq[String],
           strict: Boolean = false): DataFrame = {
    val leftOut = left.columns.toSeq
    val l = left.select(
      leftOut.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag")): _*)
    val r = right.select(
      keys.map(col) ++
        leftOut.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payload.map(col) ++
        Seq(col(rightTime).as("__t"), lit(if (strict) 2 else 0).as("__tag")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__tag") === 1).drop("__t", "__tag")
  }
}
