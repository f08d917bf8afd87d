package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import graft.schema.ParkingModel
import org.apache.spark.sql.functions._

class EventLakeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val lakeDir: String = {
    val dir = Files.createTempDirectory("graft-lake").toString
    EventLake.writePartitioned(ParkingModel.parkingEvents(spark, sfDir), dir)
    dir
  }

  "EventLake" should "round-trip events through partitioned gzip JSON at µs precision" in {
    val orig = ParkingModel.parkingEvents(spark, sfDir)
      .select("event_id", "ts", "eventType", "licensePlate", "vehicleType",
        "parkingLotId", "parkingSpotId", "isSlotHandicapped", "duration_ms")
    val back = EventLake.read(spark, lakeDir)
      .select("event_id", "ts", "eventType", "licensePlate", "vehicleType",
        "parkingLotId", "parkingSpotId", "isSlotHandicapped", "duration_ms")
    back.count() shouldBe orig.count()
    // exceptAll is symmetric-difference-empty ⇒ multiset equality
    back.exceptAll(orig).count() shouldBe 0
    orig.exceptAll(back).count() shouldBe 0
  }

  it should "write gzip JSON-lines files in y/m/d/h partition dirs (S8 layout)" in {
    val files = Files.walk(java.nio.file.Paths.get(lakeDir)).toArray.map(_.toString)
    files.exists(_.matches(".*y=\\d{4}/m=\\d{2}/d=\\d{2}/h=\\d{2}/part-.*\\.json\\.gz")) shouldBe true
  }

  it should "prune partitions for an hour-scoped read" in {
    val hour = EventLake.readHour(spark, lakeDir, "2024", "01", "01", "10")
    val expected = ParkingModel.parkingEvents(spark, sfDir)
      .filter(date_format(col("ts"), "yyyy-MM-dd HH") === "2024-01-01 10")
    hour.count() shouldBe expected.count()
    hour.count() should be > 0L
    val plan = hour.queryExecution.executedPlan.toString
    plan should include("PartitionFilters: [")
    plan should include("isnotnull(h")
  }

  it should "extract ingest time from the file path (F2) agreeing with event time truncation" in {
    val withIngest = EventLake.readWithIngestTime(spark, lakeDir)
    withIngest.count() should be > 0L
    // the lake partitions by event-time y/m/d/h, so path-derived ingest_ts
    // must equal the event ts truncated to the hour for every row
    withIngest
      .filter(col("ingest_ts") =!= date_trunc("hour", col("ts")))
      .count() shouldBe 0L
  }

  it should "tolerate corrupt lines in the lake (S3 permissive read)" in {
    val dir = Files.createTempDirectory("graft-lake-corrupt")
    EventLake.writePartitioned(ParkingModel.parkingEvents(spark, sfDir).limit(10),
      dir.toString)
    // drop a corrupt uncompressed file beside the gzip parts, inside a
    // valid partition dir
    val part = Files.walk(dir).filter(p => p.toString.contains("h=")).toArray
      .map(_.asInstanceOf[java.nio.file.Path]).find(Files.isDirectory(_)).get
    Files.write(part.resolve("corrupt-extra.json"), "NOT JSON AT ALL\n{\"броken\"".getBytes)
    val n = EventLake.read(spark, dir.toString).count()
    n shouldBe 10L
  }
}
