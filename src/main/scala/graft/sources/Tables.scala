package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  *
  * All reads are plain `spark.read.parquet` so Catalyst gets full predicate
  * pushdown + column pruning against the parquet footers; at cluster scale the
  * same call works against an object-store path (s3a://...) unchanged — the
  * reference instead hand-listed MinIO objects and staged them to /tmp
  * (reference MinioService.scala:57-135), which we deliberately do not port.
  */
object Tables {
  /** events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read it as nanos-since-epoch LongType (legacy conf) — the
    * adapter converts to TimestampType with exact integer division.
    *
    * Also pins the session timezone to UTC: every date_format/unix_timestamp
    * downstream depends on it, and callers may hand us an externally built
    * session. Both confs are session-global; they are set here (not only in
    * Verify/Bench) so the determinism contract is self-enforcing.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    read(spark, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")

  /** U1 multi-path union scan (reference MainWeekly.scala:141-163 — the
    * weekly job concatenates seven day-prefixes into one read): Spark's
    * multi-path parquet read plans all paths as a single relation, so
    * pushdown/pruning apply across the whole union. */
  def eventsUnion(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(dirs.map(d => s"$d/events.parquet"): _*)
  }

  /** P7 empty-input guard (reference MainHourly.scala:82-87 threw on an
    * empty hour before aggregating): fail fast with context instead of
    * publishing an all-zero document. */
  def requireNonEmpty(df: DataFrame, what: String): DataFrame = {
    if (df.isEmpty) throw new IllegalStateException(s"no input rows for $what")
    df
  }

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
