package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev measurement harness for the LOW-KEY-CARDINALITY window remedies
  * (p52's bucketed percentiles, p76's ranged trailing frame): times the
  * scalable plan against the naive definitional plan (one full sort per
  * key) on deterministic synthetic data at 1×/10×/100×, 3 keys
  * throughout — the exact shape where a per-key window's parallelism
  * collapses to 3 tasks. Run:
  *
  *   sbt "runMain graft.ScaleBench"            # 1M / 10M / 100M rows
  *   sbt "runMain graft.ScaleBench 1000000 10000000"
  *
  * Prints one JSON line per (op, plan, rows) with wall seconds; the
  * curves land in bench_records/. Synthetic on purpose: sf0.1's 600k
  * events can't show a 100× curve, and the operators' cost drivers
  * (rows per key, value ties) are fully captured by the generator. */
object ScaleBench {

  import DevBench.time

  /** 3 keys; per-key times tick ~1/s (trailing hour ≈ 1200 rows in
    * frame); values are a deterministic hash mix with heavy low-end ties
    * (the duration distribution's shape). */
  private def synth(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      concat(lit("lot"), (col("id") % 3).cast("string")).as("key"),
      (col("id") / 3).as("t"),
      pmod(hash(col("id")), lit(10000)).cast("long").as("v"))

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(1000000L, 10000000L, 100000000L)
    val spark = DevBench.session()

    val qs = Seq(0.5, 0.9, 0.99)
    // the naive plans are O(n × frame) in 3 tasks — past this cap they run
    // for tens of minutes and the curve's point is already made
    val naiveMax = sys.env.getOrElse("SCALE_NAIVE_MAX", "20000000").toLong
    for (n <- sizes) {
      val df = synth(spark, n).persist()
      df.count() // materialize once so every plan times pure compute

      val ranged = time {
        graft.ops.RangedWindow.trailingCount(df, Seq("key"), "t", 3599L,
          numRanges = 32, out = "c").agg(sum("c")).head()
      }
      val naiveW = if (n > naiveMax) Double.NaN else time {
        val w = Window.partitionBy("key").orderBy(col("t").cast("long"))
          .rangeBetween(-3599, Window.currentRow)
        df.withColumn("c", count(lit(1)).over(w)).agg(sum("c")).head()
      }
      val bucketed = time {
        graft.ops.Percentiles.exactRankSelect(df, "key", "v", qs).collect()
      }
      val naiveP = if (n > naiveMax) Double.NaN else time {
        val byKey = Window.partitionBy("key")
        df.withColumn("rn", row_number().over(byKey.orderBy("v")))
          .withColumn("nn", count(lit(1)).over(byKey))
          .filter(qs.map(q =>
            col("rn") === greatest(lit(1), ceil(lit(q) * col("nn"))).cast("int"))
            .reduce(_ || _))
          .collect()
      }
      df.unpersist(false)
      def j(d: Double) = if (d.isNaN) "null" else f"$d%.2f"
      println(s"""{"op":"trailing_window","rows":$n,"ranged_sec":${j(ranged)},"naive_sec":${j(naiveW)}}""")
      println(s"""{"op":"percentiles","rows":$n,"bucketed_sec":${j(bucketed)},"naive_sec":${j(naiveP)}}""")
    }
    spark.stop()
  }
}
