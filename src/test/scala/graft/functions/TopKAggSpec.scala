package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate vs the definitional sort-and-take, on
  * random groups spread over many partitions so the partial→shuffle→final
  * path (serialize/deserialize + heap merge) really runs. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  "topk" should "match sort-and-take on random groups (ties, small groups, many partitions)" in {
    val rnd = new scala.util.Random(7)
    val rows = for {
      g <- 0L until 12L
      _ <- 0 until (3 + (g.toInt * 7) % 40) // some groups smaller than k
    } yield (g, (rnd.nextInt(6).toDouble - 3) / 4.0, rnd.nextInt(1000).toLong)
    val df = rows.toDF("query_id", "sim", "neighbor_id").repartition(8)
    val got = df.groupBy("query_id")
      .agg(TopKAgg.topk(col("sim"), col("neighbor_id"), 5).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("pos"), col("col.neighbor_id"), col("col.sim"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq).toMap
    val want = rows.groupBy(_._1).view.mapValues { rs =>
      rs.map(r => (r._3, r._2))
        .sortBy { case (id, s) => (-s, id) }.take(5).toSeq
    }.toMap
    got shouldBe want
  }

  it should "keep exactly min(k, group size) entries" in {
    val df = Seq((1L, 0.5, 10L), (1L, 0.7, 11L), (2L, 0.1, 12L))
      .toDF("query_id", "sim", "neighbor_id")
    val sizes = df.groupBy("query_id")
      .agg(org.apache.spark.sql.functions.size(
        TopKAgg.topk(col("sim"), col("neighbor_id"), 5)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    sizes shouldBe Map(1L -> 2, 2L -> 1)
  }
}
