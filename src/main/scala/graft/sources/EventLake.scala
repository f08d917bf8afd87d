package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventDecode

/** The time-partitioned immutable event lake (SURVEY.md §1.1#2): gzip
  * JSON-lines partitioned by y/m/d/h — the reference's Kafka-Connect S3
  * sink layout (k8s/kafka/s3-sink-connector.yml:23-46, path.format
  * yyyy/MM/dd/HH) re-expressed as a native Spark partitioned write (S8),
  * plus the schema'd permissive read-back (S1/S3/F10,
  * MainHourly.scala:29-67).
  *
  * Scale notes: the hive-style partition directories make the hourly jobs'
  * path-glob pruning (MainHourly.scala:233) a plain `WHERE` on partition
  * columns — Catalyst prunes at planning time, no object-store listing of
  * untouched hours. Timestamps round-trip at microsecond precision via an
  * explicit 6-digit-fraction format (the default JSON format is
  * millisecond-truncating).
  */
object EventLake {
  val TimestampFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Flat event frame → nested reference JSON shape, gzip, partitioned by
    * event-time y/m/d/h. */
  def writePartitioned(events: DataFrame, path: String): Unit =
    events
      .select(
        col("event_id"),
        col("eventType"),
        col("ts").as("timestamp"),
        struct(col("licensePlate"), col("vehicleType"), lit("unknown").as("color"))
          .as("vehicle"),
        struct(col("parkingLotId"), col("parkingSpotId"), col("isSlotHandicapped"))
          .as("parking"),
        col("duration_ms").as("duration"),
        date_format(col("ts"), "yyyy").as("y"),
        date_format(col("ts"), "MM").as("m"),
        date_format(col("ts"), "dd").as("d"),
        date_format(col("ts"), "HH").as("h"))
      .write
      .partitionBy("y", "m", "d", "h")
      .mode("overwrite")
      .option("compression", "gzip")
      .option("timestampFormat", TimestampFormat)
      .json(path)

  /** Schema'd PERMISSIVE read of the lake (never infer on the hot path —
    * MainHourly deliberately declares its StructType) flattened to the
    * canonical event frame. Corrupt lines decode to null rows and are
    * dropped by the flatten filter (S3 tolerance). Partition columns stay
    * available for pruning predicates (`where y= .. and h= ..`). */
  def read(spark: SparkSession, path: String): DataFrame =
    EventDecode.flattenNested(readNested(spark, path))

  /** One clock hour of the lake — the unit the reference's hourly job
    * consumes (MainHourly.scala:233 built an S3 glob by hand). The
    * partition-column equality filters are applied on the nested relation,
    * so Catalyst prunes directories at planning time (`PartitionFilters` in
    * the scan, zero IO on other hours). */
  def readHour(spark: SparkSession, path: String,
               y: String, m: String, d: String, h: String): DataFrame =
    EventDecode.flattenNested(
      readNested(spark, path)
        .filter(col("y") === y && col("m") === m && col("d") === d && col("h") === h))

  /** F2 (reference MainDaily.scala:47-58 / MainWeekly.scala:78-95): the
    * reference parsed ingest time back out of the object PATH because the
    * Kafka-Connect sink encoded it there; same capability here —
    * `input_file_name()` + `regexp_extract` over the partition directories
    * rebuilt into a timestamp column. The partition values are also plain
    * columns (y/m/d/h), so this exists for path-shaped lakes that are NOT
    * hive-partitioned; on this lake the two agree (tested). */
  def readWithIngestTime(spark: SparkSession, path: String): DataFrame = {
    val f = input_file_name()
    def part(re: String) = regexp_extract(f, re, 1).cast("int")
    EventDecode.flattenNested(readNested(spark, path))
      .withColumn("ingest_ts",
        make_timestamp(
          part("y=(\\d{4})"), part("m=(\\d{2})"), part("d=(\\d{2})"),
          part("h=(\\d{2})"), lit(0), lit(0)))
  }

  private def readNested(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(EventDecode.ParkingEventSchema)
      .option("mode", "PERMISSIVE")
      .option("timestampFormat", TimestampFormat)
      .json(path)
}
