package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness for round-12's one flagged scale weakness: IVF cell
  * assignment must scale in CELL count, not just row count (the √n rule
  * puts a 100 TB corpus at ~10⁵ cells). Measures per-vector argmax
  * assignment over a fixed 200k-vector corpus as nCells grows, on both
  * paths:
  *
  *  - `literal`: the historical `array(struct(cosine(vec, typedLit(cv))
  *    …))` plan — one expression node per centroid, so analysis/codegen
  *    cost grows with the cell count and collapses far below 10⁵ cells;
  *  - `fused`: [[graft.functions.CellArgmax]] — the centroid matrix
  *    rides codegen as ONE reference object, so plan size is constant
  *    and the per-row cost is a flat nCells×dim multiply-add loop.
  *
  * The literal path is attempted only up to `LiteralCap` cells (beyond
  * that it is the known failure mode this harness exists to document —
  * wall-clock explodes in plan construction/janino, not in data).
  *
  * Run: `sbt "runMain graft.ScaleCellsBench"` (or pass cell counts).
  * One JSON line per (path, nCells); curves land in bench_records/.
  */
object ScaleCellsBench {

  import DevBench.time

  val CorpusRows = 200000L
  val LiteralCap = 5000

  /** Planted-cluster corpus: `nClusters` deterministic pseudo-random
    * centers + 10%-scale hash noise — the data shape real embedding
    * corpora have (and the two-level quantizer's operating premise; the
    * uniform corpus is its adversarial worst case). */
  def synthClustered(spark: SparkSession, n: Long, nClusters: Int,
                     dim: Int = 64): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), d -> CAST(" +
        s"(pmod(hash(id % $nClusters, d), 1000003) / 1000003.0 - 0.5) + " +
        s"0.05 * (pmod(hash(id, d), 1000003) / 1000003.0 - 0.5) AS FLOAT))")
        .as("embedding"))

  def main(args: Array[String]): Unit = {
    val cellCounts = if (args.nonEmpty) args.map(_.toInt).toSeq
                     else Seq(707, 2000, 5000, 10000, 20000)
    val spark = DevBench.session()
    import graft.ann.Similarity

    val emb = ScaleAnnBench.synthEmbeddings(spark, CorpusRows).persist()
    emb.count()
    for (nCells <- cellCounts) {
      val cents = Similarity.lowestIdCentroids(emb, "vec_id", "embedding", nCells)
      val tFused = time {
        DevBench.mat(emb.select(col("vec_id"),
          graft.functions.CellArgmax(col("embedding"), cents).as("cell")))
      }
      println(f"""{"op":"assign_fused","vecs":$CorpusRows,"cells":$nCells,"sec":$tFused%.2f}""")
      if (nCells <= LiteralCap) {
        val tLit = time {
          DevBench.mat(emb.select(col("vec_id"),
            Similarity.cellOfSpec(col("embedding"), cents).as("cell")))
        }
        println(f"""{"op":"assign_literal","vecs":$CorpusRows,"cells":$nCells,"sec":$tLit%.2f}""")
      } else {
        println(s"""{"op":"assign_literal","vecs":$CorpusRows,"cells":$nCells,"sec":null,"skipped":"literal plan beyond $LiteralCap cells"}""")
      }
      // the full search at this cell count on the fused path: probes +
      // broadcast join + top-k, the end-to-end cost a deployment sees
      val tSearch = time {
        DevBench.mat(Similarity.knnIvfWith(emb, "vec_id", "embedding",
          col("vec_id") < 20, cents, nProbe = math.max(2, nCells / 100)))
      }
      println(f"""{"op":"ivf_search_fused","vecs":$CorpusRows,"cells":$nCells,""" +
        f""""nprobe":${math.max(2, nCells / 100)},"sec":$tSearch%.2f}""")
      // two-level nested assignment (round 14): √-sized supercluster
      // layer trained driver-side over the CELL TABLE; per-row cost
      // ~O((√nCells·(1+w))·dim) instead of O(nCells·dim), agreement vs
      // the flat argmax quoted beside every speed number — on the
      // uniform corpus (agreement's worst case: no cluster structure,
      // near-flat cosine margins) AND a planted-cluster corpus with
      // real-data-shaped structure
      for ((corpusName, corpus) <- Seq(
          "uniform" -> emb,
          "clustered" -> synthClustered(spark, CorpusRows, nCells / 4).persist())) {
        corpus.count()
        val ccents = if (corpusName == "uniform") cents
          else Similarity.lowestIdCentroids(corpus, "vec_id", "embedding", nCells)
        var supers: Array[(Long, Array[Float])] = null
        var cellsW: Array[(Long, Long, Array[Float])] = null
        val tTrain2 = time {
          val r = Similarity.trainTwoLevel(ccents)
          supers = r._1; cellsW = r._2
        }
        val flatDf = corpus.select(col("vec_id"),
          graft.functions.CellArgmax(col("embedding"), ccents).as("flat"))
          .persist()
        flatDf.count()
        for (w <- Seq(2, 4)) {
          var nested: DataFrame = null
          val tNested = time {
            nested = corpus.select(col("vec_id"),
              Similarity.cellOfTwoLevel(col("embedding"), supers, cellsW, w)
                .as("cell")).persist()
            nested.count()
          }
          val agreeRow = nested.join(flatDf, "vec_id")
            .agg(sum((col("cell") === col("flat")).cast("long")), count(lit(1)))
            .head()
          nested.unpersist(false)
          println(f"""{"op":"assign_two_level","corpus":"$corpusName",""" +
            f""""vecs":$CorpusRows,"cells":$nCells,""" +
            f""""supers":${supers.length},"w":$w,"train_sec":$tTrain2%.2f,""" +
            f""""sec":$tNested%.2f,"agree":${agreeRow.getLong(0).toDouble / agreeRow.getLong(1)}%.4f}""")
        }
        flatDf.unpersist(false)
        if (corpusName == "clustered") corpus.unpersist(false)
      }
    }
    emb.unpersist(false)
    spark.stop()
  }
}
