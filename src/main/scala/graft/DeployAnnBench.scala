package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Deployment rehearsal for the persisted ANN index at miner-rung scale
  * (round-16 verdict item 6): the p128/p129 flow — train a derived-size
  * coarse quantizer + residual PQ codebooks, encode, WRITE the
  * cell-partitioned codes store, then search it with static partition
  * pruning and exact re-rank — at 1M and 10M vectors with the cell count
  * following the sqrt rule ([[graft.ops.Adaptive.ivfCells]]: 1 000 cells
  * at 1M, 3 163 at 10M). The claim under test is the one
  * PartitionedAnnIndexSpec pins at 16 cells: partitions-read = probed
  * cells, i.e. scan fraction ≈ nProbe/nCells, HELD at a cell count where
  * directory-per-cell is at its documented limit.
  *
  * Corpus: [[ScaleCellsBench.synthClustered]] with nClusters = nCells —
  * the clustered shape real embedding corpora have (and the quantizer's
  * operating premise; uniform vectors would spread every probe across
  * all cells). Index config: the production m=16 / k=256 residual LUT-ADC
  * tier. The index write goes through a repartition(cell) (the
  * compaction layout — one file per cell), because a 32-task unkeyed
  * write × thousands of cell directories is the many-small-files
  * anti-pattern the compactor exists to cure.
  *
  * Run: `SPARK_DRIVER_MEM=48g sbt "runMain graft.DeployAnnBench
  * [vectorCounts...]"`. One JSON line per step; records land in
  * bench_records/.
  */
object DeployAnnBench {

  import DevBench.time

  private def scanPartitions(df: DataFrame, pathTag: String): Long = {
    def findScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] =
      p.collect {
        case f: FileSourceScanExec => Seq(f)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          findScans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          findScans(q.plan)
      }.flatten
    findScans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains(pathTag)))
      .map(_.metrics("numPartitions").value).sum
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(1000000L, 10000000L)
    val spark = DevBench.session()
    import graft.ann.{ProductQuantizer, Similarity}

    for (n <- sizes) {
      val nCells = graft.ops.Adaptive.ivfCells(n)
      val emb = ScaleCellsBench.synthClustered(spark, n, nCells).persist()
      emb.count()
      val dir = java.nio.file.Files
        .createTempDirectory("graft-deploy-ann").toString + "/codes_index"

      // 1. train: coarse centroids + residual codebooks (production
      // m=16/k=256). Training re-derives the residual frame per pass
      // over the PERSISTED source vectors — the deployment boundary.
      var cents: Array[(Long, Array[Float])] = null
      var cb: ProductQuantizer.Codebooks = null
      val tTrain = time {
        cents = Similarity.lowestIdCentroids(emb, "vec_id", "embedding", nCells)
        cb = ProductQuantizer.trainResidualCodebooks(
          emb, "vec_id", "embedding", cents, m = 16, k = 256)
      }
      println(f"""{"op":"deploy_ann_train","vecs":$n,"cells":$nCells,""" +
        f""""sec":$tTrain%.2f,"m":16,"k":256}""")

      // 2. encode + partitioned write (one keyed exchange of the
      // 16 B/vector codes rows → one file per cell directory).
      val (tWrite, _, wSnap) = TaskStats.scoped(spark) {
        ProductQuantizer.writeCellPartitionedIndex(
          ProductQuantizer.residualCodesIndex(
              emb, "vec_id", "embedding", cents, cb)
            .repartition(col("cell")),
          dir)
      }
      val files = {
        val p = new java.io.File(dir)
        def walk(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1L else 0L
        walk(p)
      }
      println(f"""{"op":"deploy_ann_index_write","vecs":$n,"cells":$nCells,""" +
        f""""sec":$tWrite%.2f,"files":$files,${wSnap.json}}""")

      // 3. pruned search over the persisted store: 20 queries, nProbe 2,
      // kShort=100 shortlist for the re-rank stage below (the planted
      // clusters hold ~n/nCells near-identical members, so a narrow
      // shortlist would make recall an ADC-noise lottery). UNPERSISTED:
      // the scan metrics (partitions read) live on the executed plan,
      // and a persist would interpose an InMemoryRelation over them.
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").cast("long").as("query_id"),
          col("embedding").as("qe")).persist()
      queries.count()
      val shortlist = ProductQuantizer.searchPersistedIndexLut(
        spark, dir, queries, cents, cb, k = 100, nProbe = 2)
      // collect(), not count(): count() spawns its own query execution,
      // leaving the scan metrics on THIS dataset's plan unpopulated
      val tSearch = time { shortlist.collect() }
      val partsRead = scanPartitions(shortlist, "codes_index")
      println(f"""{"op":"deploy_ann_search","vecs":$n,"cells":$nCells,""" +
        f""""sec":$tSearch%.2f,"nprobe":2,"partitions_read":$partsRead,""" +
        f""""scan_fraction":${partsRead.toDouble / nCells}%.4f}""")

      // 4. IVFADC+R: exact re-rank of the shortlist against the source
      // vectors (broadcast candidates, one corpus scan — p129's shape).
      var reranked: DataFrame = null
      val tRerank = time {
        reranked = ProductQuantizer.rerankExact(
          shortlist, emb, "vec_id", "embedding", queries, k = 5).persist()
        reranked.count()
      }
      // 5. recall@5 against the exact answer, alongside its nProbe
      // CEILING — the fraction of exact top-5 neighbors whose cell is
      // probed at all (what recall the coarse quantizer permits; the
      // gap between ceiling and rerank recall is ADC shortlist loss).
      val exact = Similarity.knnBruteForce(
        emb, "vec_id", "embedding", col("vec_id") < 20).persist()
      val eN = exact.count()
      def recall(approx: DataFrame): Double =
        exact.select("query_id", "neighbor_id")
          .join(approx.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id")).count().toDouble / eN
      val probed = queries.select(col("query_id"),
        explode(Similarity.probeCellsOf(col("qe"), cents, 2)).as("cell"))
      val neighborCells = emb
        .join(broadcast(exact.select(col("query_id"),
          col("neighbor_id").as("vec_id"))), Seq("vec_id"))
        .select(col("query_id"), col("vec_id"),
          graft.functions.CellArgmax(col("embedding"), cents).as("cell"))
      val ceiling = neighborCells
        .join(broadcast(probed), Seq("query_id", "cell"), "left_semi")
        .count().toDouble / eN
      val rShort = recall(shortlist)
      val rRerank = recall(reranked)
      println(f"""{"op":"deploy_ann_rerank","vecs":$n,"sec":$tRerank%.2f,""" +
        f""""recall_shortlist":$rShort%.3f,"recall_rerank":$rRerank%.3f,""" +
        f""""recall_ceiling_nprobe2":$ceiling%.3f}""")

      Seq(queries, reranked, exact, emb).foreach(_.unpersist(false))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
    spark.stop()
  }
}
