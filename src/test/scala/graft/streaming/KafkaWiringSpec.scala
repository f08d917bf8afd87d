package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.types.StringType

/** S5/S7/ST7 wiring, the only Kafka surface testable without a broker
  * (the spark-sql-kafka connector is not on the sandbox classpath, so
  * `.load()`/`.start()` cannot run here): the producer-record shaping must
  * be exactly (key STRING, value STRING) and the reader/writer option maps
  * must carry the configured topic, servers, and backpressure bound.
  */
class KafkaWiringSpec extends SparkSpec {
  import spark.implicits._

  "KafkaEventSink.shape" should "produce exactly (key STRING, value STRING)" in {
    val df = Seq((1L, "P-42", "lot-01")).toDF("event_id", "licensePlate", "parkingLotId")
    val shaped = KafkaEventSink.shape(df, "licensePlate")
    shaped.schema.fields.map(f => (f.name, f.dataType)).toSeq shouldBe
      Seq(("key", StringType), ("value", StringType))
    val row = shaped.collect().head
    row.getString(0) shouldBe "P-42"
    // value is the full record as JSON — per-vehicle keying + whole event
    row.getString(1) should include(""""event_id":1""")
    row.getString(1) should include(""""parkingLotId":"lot-01"""")
  }

  it should "key null-safely (tombstone-style null key, not a crash)" in {
    val df = Seq((Option.empty[String], 7L)).toDF("licensePlate", "event_id")
    KafkaEventSink.shape(df, "licensePlate").collect().head.isNullAt(0) shouldBe true
  }

  "KafkaEventSink.options" should "carry servers, topic and checkpoint" in {
    KafkaEventSink.options("broker:9092", "parking-alerts", "/ckpt") shouldBe Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "topic" -> "parking-alerts",
      "checkpointLocation" -> "/ckpt")
  }

  "KafkaEventSource.options" should "subscribe and bound the batch size (ST7)" in {
    val opts = KafkaEventSource("broker:9092", "parking-events", 12345L).options
    opts("kafka.bootstrap.servers") shouldBe "broker:9092"
    opts("subscribe") shouldBe "parking-events"
    opts("startingOffsets") shouldBe "earliest"
    opts("maxOffsetsPerTrigger") shouldBe "12345"
  }
}
