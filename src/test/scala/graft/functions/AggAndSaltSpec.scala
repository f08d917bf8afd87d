package graft.functions

import graft.SparkSpec
import graft.schema.ParkingModel
import org.apache.spark.sql.functions._

class AggAndSaltSpec extends SparkSpec {
  import spark.implicits._

  "OccupancyAgg" should "equal the composed max_by plan on real data" in {
    val events = ParkingModel.parkingEvents(spark, "/root/testdata/sf0.001")
    // typed path: one aggregation per lot via the custom Aggregator
    val typed = events
      .select(col("parkingLotId"), col("parkingSpotId").as("spot"),
        (col("eventType") === "PARKING_ENTRY").as("isEntry"),
        col("event_id").as("eventId"))
      .as[(String, String, Boolean, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, spot, e, id) => SlotEvt(spot, e, id) }
      .agg(OccupancyAgg.toColumn.name("occupied"))
      .collect().toMap
    // composed plan: the p10-style two-level aggregation
    val composed = events
      .groupBy("parkingLotId", "parkingSpotId")
      .agg(max_by(col("eventType"), col("event_id")).as("last"))
      .groupBy("parkingLotId")
      .agg(count(when(col("last") === "PARKING_ENTRY", 1)).as("occupied"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    typed shouldBe composed
  }

  it should "merge partial buffers associatively" in {
    val b1 = OccupancyAgg.reduce(OccupancyAgg.zero, SlotEvt("s1", isEntry = true, 1L))
    val b2 = OccupancyAgg.reduce(OccupancyAgg.zero, SlotEvt("s1", isEntry = false, 2L))
    OccupancyAgg.finish(OccupancyAgg.merge(b1, b2)) shouldBe 0L // exit is newer
    OccupancyAgg.finish(OccupancyAgg.merge(b2, b1)) shouldBe 0L // order-insensitive
    val b3 = OccupancyAgg.reduce(b1, SlotEvt("s2", isEntry = true, 3L))
    OccupancyAgg.finish(b3) shouldBe 2L
  }

  "saltedJoin" should "be result-identical to the plain inner join" in {
    // heavily skewed big side: 90% of rows share one key
    val big = spark.range(10000)
      .select(when(col("id") % 10 < 9, "hot").otherwise(concat(lit("k"), col("id") % 7))
        .as("k"), col("id").as("v"))
    val small = Seq(("hot", 1), ("k0", 2), ("k3", 3)).toDF("k", "w")
    val plain = big.join(small, "k").select("k", "v", "w")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Salting.saltedJoin(big, small, "k", salts = 8).select("k", "v", "w")
      .collect().map(_.toSeq).sortBy(_.toString)
    salted shouldBe plain
    plain.length should be > 9000 // the hot key actually dominated
  }
}
