package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement harness for the ANN family — the one iterative-family
  * gap in the round-8 scaling ladders ([[ScaleCorpusBench]] covers
  * dedup/CC/as-of/packing): brute-force vs sign-LSH vs IVF cosine top-k,
  * timed at 10×/100× of sf0.1's embedding volume, with recall@k against
  * the exact answer measured at every rung so speed is never quoted
  * without its quality price.
  *
  * Synthetic on purpose (the sf dirs stop at 5 000 vectors): vectors are
  * Murmur3-hashed per (id, coordinate) — deterministic, no RNG state, and
  * deliberately NOT the Knuth lattice [[graft.functions.AnnPrims.plane]]
  * uses: the round-8 generator shared the planes' lattice, which
  * correlated corpus and planes so badly that every rung hit ≤23 sign
  * buckets and reported recall 1.000 — a degenerate testbed for exactly
  * the occupancy/recall questions this harness exists to answer.
  * 20 fixed queries (vec_id < 20), k = 5.
  *
  * Run: `sbt "runMain graft.ScaleAnnBench"` (or pass vector counts).
  * One JSON line per (op, size); curves land in bench_records/.
  */
object ScaleAnnBench {

  import DevBench.time

  /** n deterministic dim-64 float vectors in [-0.5, 0.5). */
  def synthEmbeddings(spark: SparkSession, n: Long, dim: Int = 64): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dim - 1}), d -> " +
        s"CAST(pmod(hash(id, d), 1000003) / 1000003.0 - 0.5 AS FLOAT))")
        .as("embedding"))

  private def recall(exact: DataFrame, approx: DataFrame): Double = {
    val e = exact.select("query_id", "neighbor_id")
    val hits = e.join(approx.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id")).count()
    hits.toDouble / e.count()
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(5000L, 50000L, 500000L)
    val spark = DevBench.session()
    import graft.ann.Similarity

    val pred = col("vec_id") < 20
    for (n <- sizes) {
      val emb = synthEmbeddings(spark, n).persist()
      emb.count()
      var exact: DataFrame = null
      val tBf = time {
        exact = Similarity.knnBruteForce(emb, "vec_id", "embedding", pred)
        exact = exact.persist(); exact.count()
      }
      var lsh: DataFrame = null
      val tLsh = time {
        lsh = Similarity.knnLsh(emb, "vec_id", "embedding", pred,
          nPlanes = graft.ops.Adaptive.Auto)
        lsh = lsh.persist(); lsh.count()
      }
      var ivf: DataFrame = null
      val tIvf = time {
        ivf = Similarity.knnIvf(emb, "vec_id", "embedding", pred,
          nCells = graft.ops.Adaptive.Auto)
        ivf = ivf.persist(); ivf.count()
      }
      // multi-table OR-construction, adaptive tables × planes: the scale
      // path for single-table LSH's recall collapse (0.02 at 500k)
      var multi: DataFrame = null
      val tMulti = time {
        multi = Similarity.knnLshMulti(emb, "vec_id", "embedding", pred,
          tables = graft.ops.Adaptive.Auto,
          planesPerTable = graft.ops.Adaptive.Auto)
        multi = multi.persist(); multi.count()
      }
      // PQ tier (round 12): train-once cost, one-pass encode throughput
      // (the index-build step a deployment pays once and stores), then
      // exhaustive-ADC and IVF-PQ search at the p105/p106 config (m=8,
      // k=16) — recall quoted beside every speed number like the rest of
      // the ladder. Coarse cells follow the sqrt rule the IVF rung uses.
      import graft.ann.ProductQuantizer
      var cb: ProductQuantizer.Codebooks = null
      val tPqTrain = time {
        cb = ProductQuantizer.trainCodebooks(emb, "vec_id", "embedding")
      }
      val tPqEncode = time {
        DevBench.mat(ProductQuantizer.encode(emb, "vec_id", "embedding", cb))
      }
      var pq: DataFrame = null
      val tPq = time {
        pq = ProductQuantizer.knnPq(emb, "vec_id", "embedding", pred, cb)
        pq = pq.persist(); pq.count()
      }
      var ivfpq: DataFrame = null
      val nCellsPq = graft.ops.Adaptive.ivfCells(n)
      val centsPq = Similarity.lowestIdCentroids(emb, "vec_id", "embedding", nCellsPq)
      val tIvfPq = time {
        ivfpq = ProductQuantizer.knnIvfPq(emb, "vec_id", "embedding", pred,
          centsPq, cb, nProbe = 2)
        ivfpq = ivfpq.persist(); ivfpq.count()
      }
      // the deployment split: index built (and stored) once at ingest,
      // then each query batch pays only probe + ADC over its cells
      var pqIdx: DataFrame = null
      val tPqIndex = time {
        pqIdx = ProductQuantizer.pqIndex(emb, "vec_id", "embedding", centsPq, cb)
          .persist()
        pqIdx.count()
      }
      val qset = emb.filter(pred).select(
        col("vec_id").as("query_id"), col("embedding").as("qe")).persist()
      qset.count()
      var idxSearch: DataFrame = null
      val tIdxSearch = time {
        idxSearch = ProductQuantizer.searchIndex(pqIdx, qset, centsPq, nProbe = 2)
        idxSearch = idxSearch.persist(); idxSearch.count()
      }
      // LUT-ADC deployment split (round 13): codes-only residual index +
      // per-probe m·k distance tables, candidates cost m lookups — at the
      // SAME (m, k) budget as the decode-ADC rung above, and at the
      // production m=16/k=256 residual config
      var lutSearch: DataFrame = null
      var lutSearch256: DataFrame = null
      val resCb = ProductQuantizer.trainResidualCodebooks(emb, "vec_id",
        "embedding", centsPq, m = ProductQuantizer.DefaultM,
        k = ProductQuantizer.DefaultK)
      var resIdx: DataFrame = null
      val tResIdx = time {
        resIdx = ProductQuantizer.residualCodesIndex(emb, "vec_id",
          "embedding", centsPq, resCb).persist()
        resIdx.count()
      }
      val tLutSearch = time {
        lutSearch = ProductQuantizer.searchResidualIndexLut(resIdx, qset,
          centsPq, resCb, nProbe = 2)
        lutSearch = lutSearch.persist(); lutSearch.count()
      }
      // decode-ADC over the SAME residual config — the apples-to-apples
      // LUT-vs-decode comparison (the raw-codes pq_index_search rung
      // above quantizes different vectors, so its recall differs)
      var decSearch: DataFrame = null
      var decIdx: DataFrame = null
      val tDecIdx = time {
        decIdx = ProductQuantizer.residualIndex(emb, "vec_id", "embedding",
          centsPq, resCb).persist()
        decIdx.count()
      }
      val tDecSearch = time {
        decSearch = ProductQuantizer.searchResidualIndex(decIdx, qset,
          centsPq, nProbe = 2)
        decSearch = decSearch.persist(); decSearch.count()
      }
      val resCb256 = ProductQuantizer.trainResidualCodebooks(emb, "vec_id",
        "embedding", centsPq, m = 16, k = 256)
      var resIdx256: DataFrame = null
      val tResIdx256 = time {
        resIdx256 = ProductQuantizer.residualCodesIndex(emb, "vec_id",
          "embedding", centsPq, resCb256).persist()
        resIdx256.count()
      }
      val tLutSearch256 = time {
        lutSearch256 = ProductQuantizer.searchResidualIndexLut(resIdx256,
          qset, centsPq, resCb256, nProbe = 2)
        lutSearch256 = lutSearch256.persist(); lutSearch256.count()
      }
      val rLsh = recall(exact, lsh)
      val rIvf = recall(exact, ivf)
      val rMulti = recall(exact, multi)
      val rPq = recall(exact, pq)
      val rIvfPq = recall(exact, ivfpq)
      // adaptive-plane bucket occupancy: with lshPlanes(n) the expected
      // members per bucket must stay ~flat across rungs (a fixed plane
      // count would grow it linearly — the round-8 parameter bound)
      val planes = graft.ops.Adaptive.lshPlanes(n)
      val occ = emb.select(graft.functions.AnnPrims
          .signBucket(col("embedding"), 0, planes).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("c"))
        .agg(max("c").as("mx"), avg("c").as("av"), count(lit(1)).as("nb"))
        .head()
      println(f"""{"op":"knn_bruteforce","vecs":$n,"sec":$tBf%.2f,"recall":1.0}""")
      println(f"""{"op":"knn_lsh","vecs":$n,"sec":$tLsh%.2f,"recall":$rLsh%.3f}""")
      println(f"""{"op":"lsh_occupancy","vecs":$n,"planes":$planes,""" +
        f""""buckets_hit":${occ.getLong(2)},"max_bucket":${occ.getLong(0)},""" +
        f""""avg_bucket":${occ.getDouble(1)}%.1f}""")
      println(f"""{"op":"knn_ivf_auto","vecs":$n,"sec":$tIvf%.2f,"recall":$rIvf%.3f}""")
      val mTables = graft.ops.Adaptive.lshMultiTables(planes)
      println(f"""{"op":"knn_lsh_multi_auto","vecs":$n,"sec":$tMulti%.2f,""" +
        f""""recall":$rMulti%.3f,"tables":$mTables,"planes_per_table":$planes}""")
      println(f"""{"op":"pq_train","vecs":$n,"sec":$tPqTrain%.2f}""")
      println(f"""{"op":"pq_encode","vecs":$n,"sec":$tPqEncode%.2f}""")
      println(f"""{"op":"knn_pq_adc","vecs":$n,"sec":$tPq%.2f,"recall":$rPq%.3f}""")
      println(f"""{"op":"knn_ivfpq","vecs":$n,"sec":$tIvfPq%.2f,""" +
        f""""recall":$rIvfPq%.3f,"cells":$nCellsPq,"nprobe":2}""")
      println(f"""{"op":"pq_index_build","vecs":$n,"sec":$tPqIndex%.2f}""")
      println(f"""{"op":"pq_index_search","vecs":$n,"sec":$tIdxSearch%.2f,""" +
        f""""recall":${recall(exact, idxSearch)}%.3f,"cells":$nCellsPq,"nprobe":2}""")
      println(f"""{"op":"pqr_codes_index_build","vecs":$n,"sec":$tResIdx%.2f,"m":8,"k":16}""")
      println(f"""{"op":"pqr_lut_search","vecs":$n,"sec":$tLutSearch%.2f,""" +
        f""""recall":${recall(exact, lutSearch)}%.3f,"m":8,"k":16,"cells":$nCellsPq,"nprobe":2}""")
      println(f"""{"op":"pqr_decode_index_build","vecs":$n,"sec":$tDecIdx%.2f,"m":8,"k":16}""")
      println(f"""{"op":"pqr_decode_search","vecs":$n,"sec":$tDecSearch%.2f,""" +
        f""""recall":${recall(exact, decSearch)}%.3f,"m":8,"k":16,"cells":$nCellsPq,"nprobe":2}""")
      println(f"""{"op":"pqr_codes_index_build_256","vecs":$n,"sec":$tResIdx256%.2f,"m":16,"k":256}""")
      println(f"""{"op":"pqr_lut_search_256","vecs":$n,"sec":$tLutSearch256%.2f,""" +
        f""""recall":${recall(exact, lutSearch256)}%.3f,"m":16,"k":256,"cells":$nCellsPq,"nprobe":2}""")
      // IVFADC+R (round 14): exact re-rank of the LUT shortlist against
      // the source vectors — same probes, so the delta over the LUT rung
      // is pure quantization recovery; cost is the widened shortlist's
      // LUT pass + kShort exact distances per query (broadcast joins,
      // corpus streamed). kShort sweep shows the recall/latency knee.
      for (kShort <- Seq(10, 30, 100)) {
        var rr: DataFrame = null
        val tRr = time {
          rr = ProductQuantizer.rerankExact(
            ProductQuantizer.searchResidualIndexLut(resIdx256, qset,
              centsPq, resCb256, k = kShort, nProbe = 2),
            emb, "vec_id", "embedding", qset)
          rr = rr.persist(); rr.count()
        }
        println(f"""{"op":"pqr_rerank_256","vecs":$n,"sec":$tRr%.2f,""" +
          f""""recall":${recall(exact, rr)}%.3f,"kshort":$kShort,""" +
          f""""m":16,"k":256,"cells":$nCellsPq,"nprobe":2}""")
        rr.unpersist(false)
      }
      exact.unpersist(false); lsh.unpersist(false); ivf.unpersist(false)
      multi.unpersist(false); pq.unpersist(false); ivfpq.unpersist(false)
      pqIdx.unpersist(false); qset.unpersist(false); idxSearch.unpersist(false)
      resIdx.unpersist(false); lutSearch.unpersist(false)
      decIdx.unpersist(false); decSearch.unpersist(false)
      resIdx256.unpersist(false); lutSearch256.unpersist(false)
      emb.unpersist(false)
    }
    spark.stop()
  }
}
