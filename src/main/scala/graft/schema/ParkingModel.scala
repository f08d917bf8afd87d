package graft.schema

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic adapter: driver `events` parquet → the reference's flattened
  * parking-event shape (`ParkingEventSpark`, reference
  * apps/srvc-stats/.../domain/entity/ParkingEventSpark.scala:3-13; flatten
  * select at MainHourly.scala:70-80).
  *
  * The mapping is pure arithmetic/string ops so the DuckDB oracle can compute
  * the exact same table (see [[graft.OracleSql.ParkingCte]]); every derived
  * column uses only operations with identical semantics in Spark SQL and
  * DuckDB (modulo on non-negative ints, FLOOR, CONCAT, CASE).
  *
  * Scale note: this is a narrow projection over the scan — no shuffle, fully
  * codegen'd, and column pruning still reaches the parquet reader for queries
  * that don't touch every derived column.
  */
object ParkingModel {

  /** Entry/exit assignment for the synthetic event_type values. */
  val EntryTypes: Seq[String] = Seq("view", "click", "signup")

  /** Reference revenue rate (reference MainHourly.scala:128-134, default 2). */
  val RatePerHour: Double = 2.0

  /** Event-time cutoff used by the occupancy-replay query (A5). */
  val ReplayCutoff = "2024-01-15 00:00:00"

  val VehicleTypes: Seq[String] = Seq("car", "truck", "motorcycle", "van", "suv")

  private def vehicleType(userId: Column): Column =
    VehicleTypes.zipWithIndex.foldLeft(lit(null: String)) { case (acc, (vt, i)) =>
      if (i == VehicleTypes.size - 1) coalesce(acc, lit(vt))
      else if (i == 0) when(userId % 5 === i, vt)
      else acc.when(userId % 5 === i, vt)
    }

  /** events parquet → flattened parking events (9 reference columns + keys). */
  def parkingEvents(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.events(spark, dir)
    raw.select(
      col("event_id"),
      // ts is already normalized to TimestampType(UTC) by Tables.events,
      // whatever the parquet physical encoding (nanos-long / micros-NTZ /
      // micros-UTC) — see Tables.normalizeTs.
      col("ts"),
      when(col("event_type").isin(EntryTypes: _*), lit("PARKING_ENTRY"))
        .otherwise(lit("PARKING_EXIT")).as("eventType"),
      concat(lit("P-"), col("user_id").cast("string")).as("licensePlate"),
      concat(lit("lot-0"), ((col("user_id") % 3) + 1).cast("string")).as("parkingLotId"),
      (col("user_id") % 100).cast("string").as("parkingSpotId"),
      (col("event_id") % 11 === 0).as("isSlotHandicapped"),
      vehicleType(col("user_id")).as("vehicleType"),
      floor(col("value") * 60000).cast("long").as("duration_ms"),
      col("user_id"))
  }

  /** Deterministic user registry (reference UserModel,
    * apps/repo-account/.../data/model/UserModel.scala:6-14), loaded from a
    * real dimension source — the `customer` parquet — exactly as the
    * reference loads `user:<plate>` keys from Redis (a store independent of
    * the event stream). Plates for c_custkey % 7 == 0 are intentionally
    * absent (missing ⇒ `unknown_user`, reference srvc-alert
    * ParkingEventConsumer.scala:77-89); handicapped iff c_custkey % 13 == 0
    * (~8%, matching scripts/repo-account-bulk.py's rate). user_id 0 has no
    * customer row, so it is always `unknown_user`.
    *
    * Scale note: previously this was derived by a full scan + distinct of the
    * events table and force-broadcast — at 100 TB that is an extra
    * full-table shuffle plus an unbounded driver broadcast. Loading from the
    * dimension table and letting AQE pick broadcast-vs-shuffle by measured
    * size is the plan that survives a 100× scale-up.
    */
  def users(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") % 7 =!= 0)
      .select(
        concat(lit("P-"), col("c_custkey").cast("string")).as("u_plate"),
        (col("c_custkey") % 13 === 0).as("handicapped"))
}
