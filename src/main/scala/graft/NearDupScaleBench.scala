package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ≥1M-vector rung for the embedding near-dup miner
  * ([[graft.ann.Similarity.nearDupPairs]]) — round-14 verdict item 1b:
  * prove the DERIVED plane count ([[graft.ops.Adaptive.lshPlanes]],
  * passed as `Adaptive.Auto`) keeps sign-bucket occupancy under the
  * hot-bucket cap where the shipped fixed-4-plane config saturates.
  *
  * Corpus: [[ScaleAnnBench.synthEmbeddings]] plus PLANTED near
  * duplicates — every 10th vector is its block base nudged by ±0.03
  * per coordinate (cosine ≈ 0.996 ≫ the 0.4 threshold) — because the
  * hash-random base corpus alone has essentially no pairs above any
  * sane threshold, and a miner rung without a recall column is a speed
  * number with no quality price (the ScaleAnnBench doctrine).
  *
  * Three measurements per rung:
  *   - `neardup_occupancy` at fixed 4 planes AND at Auto: buckets over
  *     the cap, and the rows they strand (a stranded row participates
  *     in NO candidate pair from that table).
  *   - `neardup_fixed4`: the shipped default. At 1M vectors every
  *     16-bucket table's buckets exceed the cap, so the miner returns
  *     ~0 pairs — cheap to run, and the honest demonstration of the
  *     saturation flag.
  *   - `neardup_auto`: derived planes — occupancy under the cap,
  *     planted-pair recall restored.
  *
  * Run: `sbt "runMain graft.NearDupScaleBench [vecCounts...]"`.
  */
object NearDupScaleBench {

  import DevBench.time

  /** [[ScaleAnnBench.synthEmbeddings]] with every 10th vector replaced
    * by a near duplicate of its block base (id − 9): coordinate d gets
    * the base value plus (hash(id, d) mod 7 − 3) × 0.01 ∈ [−0.03, 0.03]. */
  def synthWithPlanted(spark: SparkSession, n: Long, dim: Int = 64): DataFrame = {
    val base = when(pmod(col("id"), lit(10)) === 9, col("id") - 9)
      .otherwise(col("id")).cast("long")
    val isDup = pmod(col("id"), lit(10)) === 9
    spark.range(n).select(col("id").as("vec_id"),
      base.as("__b"), isDup.as("__d"))
      .select(col("vec_id"), expr(s"transform(sequence(0, ${dim - 1}), d -> " +
        "CAST(pmod(hash(__b, d), 1000003) / 1000003.0 - 0.5 + " +
        "IF(__d, (pmod(hash(vec_id, d), 7) - 3) * 0.01, 0.0) AS FLOAT))")
        .as("embedding"))
  }

  /** Per-(table, bucket) occupancy — exactly the frame nearDupPairs
    * feeds its hot-bucket gate. */
  private def occupancy(emb: DataFrame, tables: Int, ppt: Int,
                        cap: Int): (Long, Long, Long, Long) = {
    val banded = emb.select(col("vec_id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          graft.functions.AnnPrims
            .signBucket(col("embedding"), t * ppt, ppt).as("bucket"))): _*))
        .as("bb"))
      .select(col("bb.tbl").as("tbl"), col("bb.bucket").as("bucket"))
    val occ = banded.groupBy("tbl", "bucket").agg(count(lit(1)).as("m"))
    val r = occ.agg(count(lit(1)).as("buckets"),
      max("m").as("max_m"),
      sum(when(col("m") > cap, lit(1)).otherwise(lit(0))).as("over_cap"),
      sum(when(col("m") > cap, col("m")).otherwise(lit(0))).as("stranded"))
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(100000L, 1000000L)
    val spark = DevBench.session()
    import graft.ann.Similarity
    val cap = graft.text.TextDedup.DefaultMaxBucket

    for (n <- sizes) {
      val emb = synthWithPlanted(spark, n).persist()
      emb.count()
      val planted = emb.sparkSession.range(9L, n, 10L)
        .select((col("id") - 9).as("vec_a"), col("id").as("vec_b"))
      val nPlanted = planted.count()

      val autoPpt = graft.ops.Adaptive.lshPlanes(n, floor = 4, cap = 20,
        bucketRows = graft.ops.Adaptive.MinerBucketRows)
      // auto8: the recall-recovery lever for the hot-bucket stranding the
      // auto rung shows (r15_neardup_1m.md) — the lshMultiTables pairing
      // (8 tables at 16 planes) doubles the OR-construction so a pair
      // stranded in one table's hot bucket gets 7 more chances; banding
      // cost doubles, candidate volume stays ~n·16·tables
      for ((mode, ppt, tables) <- Seq(("fixed4", 4, 4), ("auto", autoPpt, 4),
                                      ("auto8", autoPpt, 8))) {
        val (buckets, maxM, overCap, stranded) = occupancy(emb, tables, ppt, cap)
        println(s"""{"op":"neardup_occupancy","vecs":$n,"mode":"$mode",""" +
          s""""planes":$ppt,"tables":$tables,"buckets_hit":$buckets,""" +
          s""""max_bucket":$maxM,"over_cap":$overCap,""" +
          s""""rows_stranded":$stranded,"cap":$cap}""")
        var pairs: DataFrame = null
        val t = time {
          pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
            tables = tables,
            planesPerTable =
              if (mode == "fixed4") 4 else graft.ops.Adaptive.Auto)
          pairs = pairs.persist(); pairs.count()
        }
        val found = pairs.count()
        val hit = planted.join(pairs, Seq("vec_a", "vec_b")).count()
        println(s"""{"op":"neardup_$mode","vecs":$n,"sec":${f"$t%.2f"},""" +
          s""""planes":$ppt,"tables":$tables,"pairs":$found,"planted":$nPlanted,""" +
          s""""planted_recall":${f"${hit.toDouble / nPlanted}%.3f"}}""")
        pairs.unpersist(false)
      }
      emb.unpersist(false)
    }
    spark.stop()
  }
}
