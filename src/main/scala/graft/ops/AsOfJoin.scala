package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

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
  * `last(payload_struct, ignoreNulls)` window — each left row reads the
  * most recent right ROW seen so far in sort order. The payloads ride as
  * ONE struct per right row (null struct = left placeholder), so a right
  * row whose payload VALUE is genuinely null still wins as the latest row
  * — the per-column `last` formulation this replaces silently skipped it
  * and attached a stale earlier value. Cost is shuffle+sort of |L|+|R|
  * rows: no candidate-pair explosion (a naive time-inequality join
  * materializes |L|×|R| rows per key before picking the max), no per-row
  * subquery, and key skew degrades into ordinary shuffle-partition skew
  * that AQE handles. The tie boundary is exact by construction, not
  * ordering luck: at equal time, right rows sort before left for ≤
  * semantics and after left under `strict`.
  *
  * Parallelism: the window partitions by the keys, so [[asOf]]'s max
  * parallelism = key cardinality — the natural fit for high-cardinality
  * as-of keys (symbol, user, document). For a LOW-cardinality key over a
  * huge history (p44's 3 lots at corpus scale), use [[asOfRanged]]: it
  * sub-splits the time axis into `numRanges` ranges, seeds each range
  * with the latest right row from all earlier ranges, and runs the same
  * union-tag-window plan per (key, range) — identical results (the seed
  * dominates every older right row; in-range rows are handled by the
  * in-range sort), parallelism numRanges × keys.
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
    val (l, r) = tagged(left, right, keys, leftTime, rightTime, payload, strict)
    finish(l.unionByName(r), left.columns.toSeq, keys, payload, extraPart = Nil)
  }

  /** [[asOf]] with the time axis sub-split into `numRanges` ranges for
    * low-key-cardinality inputs. `axis` maps a time column to a
    * double-castable MONOTONE non-decreasing value (identity for numeric /
    * timestamp times; e.g. `to_timestamp(c, "yyyy-MM-dd HH")` for string
    * hour buckets) — it only steers range ASSIGNMENT, never the join
    * comparison, so a coarse monotone mapping is still exact.
    *
    * Plan: left range bounds come from one tiny min/max aggregate; both
    * sides bucket row-locally; the latest right row per (key, range) —
    * one small aggregate riding the same shuffle shape — is forward-
    * propagated as each later range's seed snapshot (a right row from an
    * earlier range always has strictly earlier axis value, so the seed
    * dominates all older rows and sorts before every in-range left row).
    * The window then partitions by (keys, range): numRanges × keys sorts
    * of |range| rows instead of key-count sorts of the entire history.
    *
    * `numRanges` defaults to [[Adaptive.Auto]]: the range count derives
    * from the left row count (target [[Adaptive.RowsPerRange]] rows per
    * range, floor 32, cap 4096) via the same bounds aggregate the plan
    * already runs — per-range volume stays constant as the input grows
    * instead of the parallelism staying constant. Any exact value can
    * still be pinned; results are identical for every choice
    * (property-tested sub-split ≡ single-window). */
  def asOfRanged(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTime: String, rightTime: String, payload: Seq[String],
                 strict: Boolean = false, numRanges: Int = Adaptive.Auto,
                 axis: Column => Column = identity): DataFrame = {
    val bounds = left.agg(
      min(axis(col(leftTime)).cast("double")).as("lo"),
      max(axis(col(leftTime)).cast("double")).as("hi"),
      count(lit(1)).as("n")).head()
    val nR = Adaptive.resolveRanges(numRanges, bounds.getLong(2))
    if (nR == 1 || bounds.isNullAt(0) ||
        bounds.getDouble(0) == bounds.getDouble(1))
      return asOf(left, right, keys, leftTime, rightTime, payload, strict)
    val lo = bounds.getDouble(0)
    val width = (bounds.getDouble(1) - lo) / nR
    def rng(t: Column): Column =
      least(lit(nR - 1), greatest(lit(0),
        floor((axis(t).cast("double") - lit(lo)) / lit(width)))).cast("int")

    val (l, r) = tagged(left, right, keys, leftTime, rightTime, payload, strict)
    val lB = l.withColumn("__rng", rng(col("__t")))
    // localCheckpoint: the right side feeds BOTH the per-range
    // latest-snapshot aggregate (whose seeds re-derive from it) and the
    // union itself — and it is typically a derived series (p44: a
    // windowed cumulative aggregate), not a raw scan. The frame is
    // (keys, payload struct, time, tag) — snapshot-series-sized, so one
    // materialization beats re-running the derivation per consumer. The
    // left side is consumed once by the union (its bounds aggregate is a
    // column-pruned scan), so it stays lazy.
    val rB = r.withColumn("__rng", rng(col("__t"))).localCheckpoint()
    // latest right row per (key, range) → the seed for every LATER range
    // that has no fresher snapshot: explode each to the ranges it could
    // seed (≤ numRanges² tiny rows per key), keep the freshest per target.
    val lastPer = rB.groupBy((keys :+ "__rng").map(col): _*)
      .agg(max_by(struct(col("__t"), col("__p")), col("__t")).as("__m"))
    val seeds = lastPer.filter(col("__rng") < lit(nR - 1))
      .withColumn("__tgt", explode(sequence(col("__rng") + 1, lit(nR - 1))))
      .groupBy((keys :+ "__tgt").map(col): _*)
      .agg(max_by(col("__m"), col("__rng")).as("__m"))
      .select(keys.map(col) ++ Seq(
        col("__m.__p").as("__p"), col("__m.__t").as("__t"),
        lit(if (strict) 2 else 0).as("__tag"), col("__tgt").as("__rng")): _*)
    val unioned = lB.unionByName(rB)
      .unionByName(seeds, allowMissingColumns = true)
    finish(unioned, left.columns.toSeq, keys, payload, extraPart = Seq("__rng"))
  }

  /** Both sides projected to a common layout: left columns (null-filled on
    * the right side), one nullable payload STRUCT `__p` (null = left
    * placeholder), the comparable time `__t`, and the tie tag. */
  private def tagged(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTime: String, rightTime: String, payload: Seq[String],
                     strict: Boolean): (DataFrame, DataFrame) = {
    val leftOut = left.columns.toSeq
    val pType = StructType(payload.map(p =>
      StructField(p, right.schema(p).dataType, nullable = true)))
    val l = left.select(
      leftOut.map(col) ++ Seq(
        lit(null).cast(pType).as("__p"),
        col(leftTime).as("__t"), lit(1).as("__tag")): _*)
    val r = right.select(
      keys.map(col) ++
        leftOut.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(payload.map(col): _*).as("__p"),
          col(rightTime).as("__t"), lit(if (strict) 2 else 0).as("__tag")): _*)
    (l, r)
  }

  /** The running-last window over the tagged union, then left rows only
    * with the payload struct unpacked back into its columns. */
  private def finish(unioned: DataFrame, leftOut: Seq[String], keys: Seq[String],
                     payload: Seq[String], extraPart: Seq[String]): DataFrame = {
    val w = Window.partitionBy((keys ++ extraPart).map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftOut.map(col) ++ payload.map(p => col(s"__p.$p").as(p)): _*)
  }
}
