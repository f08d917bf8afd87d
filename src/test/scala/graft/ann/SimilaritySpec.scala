package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // Four 4-d vectors: v1 ≈ v2 (cos ≈ 1), v3 orthogonal to v1, v4 opposite.
  private def emb = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.01f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  "knnBruteForce" should "rank the nearest vector first" in {
    val out = Similarity.knnBruteForce(emb, "vec_id", "embedding", col("vec_id") === 1L, k = 3)
      .collect()
    out.map(_.getAs[Long]("neighbor_id")).toSeq shouldBe Seq(2L, 3L, 4L)
    out.head.getAs[Double]("sim") shouldBe 0.9999 +- 0.0002
    out.last.getAs[Double]("sim") shouldBe -1.0 +- 1e-9
  }

  it should "return k rows per query at most" in {
    val out = Similarity.knnBruteForce(emb, "vec_id", "embedding", col("vec_id") <= 2L, k = 2)
    out.count() shouldBe 4 // 2 queries × 2 neighbors
  }

  "nearDupPairs" should "find only the near-identical pair at a high threshold" in {
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding", minSim = 0.95, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.toSeq shouldBe Seq((1L, 2L))
  }

  "knnIvf" should "equal brute force exactly when every cell is probed" in {
    // nProbe == nCells ⇒ every query scans the whole corpus through the
    // cell join: IVF's only approximation (unprobed cells) is off, so the
    // result must be row-for-row the brute-force answer — the strongest
    // recall statement the operator can make.
    val bf = Similarity.knnBruteForce(emb, "vec_id", "embedding", col("vec_id") <= 2L, k = 3)
      .collect().map(_.toSeq).toSeq
    val ivf = Similarity.knnIvf(emb, "vec_id", "embedding", col("vec_id") <= 2L,
      k = 3, nCells = 2, nProbe = 2)
      .collect().map(_.toSeq).toSeq
    ivf shouldBe bf
  }

  it should "restrict candidates to the probed cells" in {
    // centroids are vectors 1 and 2 (lowest ids). v1 is alone in cell 1
    // (cos(v1,c1)=1 beats cos(v1,c2)); v2/v3/v4 land in cell 2. With
    // nProbe=1, query 1 probes only its own cell → no neighbors; query 2
    // probes cell 2 → exactly {3, 4}.
    val out = Similarity.knnIvf(emb, "vec_id", "embedding", col("vec_id") <= 2L,
        k = 3, nCells = 2, nProbe = 1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    out.filter(_._1 == 1L) shouldBe empty
    out.filter(_._1 == 2L).map(_._2).toSet shouldBe Set(3L, 4L)
  }

  "trainIvfCentroids" should "be deterministic and beat sign-bucket LSH recall on the test corpus" in {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pred = col("vec_id") < 20
    def recallOf(approx: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double = {
      val hits = truth.map { case (q, t) => (t intersect approx.getOrElse(q, Set.empty)).size }.sum
      hits.toDouble / truth.values.map(_.size).sum
    }
    def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val truth = neighbors(Similarity.knnBruteForce(corpus, "vec_id", "embedding", pred))
    val cents = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding", nCells = 8, iters = 3)
    val cents2 = Similarity.trainIvfCentroids(corpus, "vec_id", "embedding", nCells = 8, iters = 3)
    cents.map(_._1) shouldBe cents2.map(_._1)
    cents.zip(cents2).foreach { case ((_, a), (_, b)) => a.toSeq shouldBe b.toSeq }
    val ivfRecall = recallOf(neighbors(
      Similarity.knnIvfWith(corpus, "vec_id", "embedding", pred, cents, nProbe = 2)), truth)
    val lshRecall = recallOf(neighbors(
      Similarity.knnLsh(corpus, "vec_id", "embedding", pred)), truth)
    info(f"recall@5: ivf-kmeans(nProbe=2/8) $ivfRecall%.3f vs sign-lsh(8 planes) $lshRecall%.3f")
    ivfRecall should be >= lshRecall
    ivfRecall should be >= 0.6
    // the OR-construction: 4 independent tables must strictly beat one
    // table's recall (single-table false negatives fade as miss^tables)
    val multiRecall = recallOf(neighbors(
      Similarity.knnLshMulti(corpus, "vec_id", "embedding", pred)), truth)
    info(f"recall@5: lsh-multi(4x8 planes) $multiRecall%.3f vs single $lshRecall%.3f")
    multiRecall should be > lshRecall
  }

  "cellProfile" should "partition the corpus exactly once and account every vector" in {
    val corpus = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val rows = Similarity.cellProfile(corpus, "vec_id", "embedding").collect()
    rows.length should be <= 8
    rows.map(_.getAs[Long]("n_vectors")).sum shouldBe corpus.count()
    // shares are exact divisions of the populations — they sum to 1
    rows.map(_.getAs[Double]("share")).sum shouldBe 1.0 +- 1e-9
    // cell ids come from the quantizer's seed vectors (lowest ids)
    val cellIds = rows.map(_.getAs[Long]("cell"))
    cellIds.toSet.size shouldBe cellIds.length
  }

  "knnLsh" should "recover near-identical vectors from the same bucket" in {
    val out = Similarity.knnLsh(emb, "vec_id", "embedding", col("vec_id") === 1L, k = 3, dim = 4)
      .collect().map(_.getAs[Long]("neighbor_id"))
    // v2 lands in v1's sign bucket with certainty (cos ≈ 1 ⇒ same side of
    // every plane whose margin exceeds the 0.01 perturbation).
    out should contain(2L)
    out should not contain 4L // opposite vector flips every plane
  }

  "semanticDedup" should "drop exactly the lower-id-witnessed near-dups inside each cell" in {
    // quantizer: v1 and v3 as cells — v1,v2 land in v1's cell, v3,v4 in v3's
    val cents = Array((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
                      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
    val kept = Similarity.semanticDedup(emb, "vec_id", "embedding", cents, minSim = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // v2 has the lower-id near-dup v1 in its cell -> dropped; v4 shares
    // v3's cell (cos(v4,c1) = -1 < cos(v4,c3) = 0) but cos(v3,v4) = 0
    // < 0.95 -> kept. Cell ids are the centroid ids.
    kept.toSeq shouldBe Seq((1L, 1L), (3L, 3L), (4L, 3L))
  }

  it should "keep everything when the threshold exceeds every within-cell cosine" in {
    val cents = Array((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
    val kept = Similarity.semanticDedup(emb, "vec_id", "embedding", cents, minSim = 1.1)
    kept.count() shouldBe 4
  }

  "prototypicalityPrune" should "drop exactly the most-prototypical dropPct of each cell" in {
    // cells: v1,v2 -> c1 (sims 1.0, ~0.99995); v3,v4 -> c3 (sims 1.0, 0.0 —
    // v4's cos to c1 is -1 so it lands in c3). dropPct=50 on n=2 cells drops
    // rank 1 (the centroid-nearest vector) and keeps rank 2.
    val cents = Array((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
                      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
    val out = Similarity.prototypicalityPrune(emb, "vec_id", "embedding", cents, dropPct = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getLong(4), r.getBoolean(5)))
    out.toSeq shouldBe Seq(
      (1L, 1L, 1, 2L, false), (2L, 1L, 2, 2L, true),
      (3L, 3L, 1, 2L, false), (4L, 3L, 2, 2L, true))
  }

  "mmrRerank" should "demote a redundant near-duplicate below a diverse candidate" in {
    // query 0 along e1; candidates: 10 ≈ e1 (top relevance), 11 an EXACT
    // duplicate of 10, 12 diverse (sim .707, low overlap with 10). At
    // λ=0.3 the duplicate's full penalty (cos=1) drops it below the
    // diverse pick; plain top-2 would keep (10, 11).
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (10L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (11L, Array(1.0f, 0.1f, 0.0f, 0.0f)),
      (12L, Array(0.707f, 0.0f, 0.707f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(vecs, "vec_id", "embedding",
        col("vec_id") === 0L, kCand = 3, m = 3, lambda = 0.3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq((1L, 10L), (2L, 12L), (3L, 11L))
  }

  it should "truncate gracefully when a query's pool is smaller than m" in {
    // 3 candidates for query 0, m = 3 via mmrRerank's guard path but a
    // SMALLER pool through mmrGreedy directly: ranks stop when the pool
    // drains, no error, no phantom rows
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (10L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (11L, Array(0.8f, 0.2f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(vecs, "vec_id", "embedding",
        col("vec_id") === 0L, kCand = 3, m = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    out.length shouldBe 2 // only two candidates exist
    out.map(_._1).toSeq shouldBe Seq(1L, 2L)
  }

  it should "match a sequential greedy reference on the fixture corpus" in {
    def cosRef(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vs = Seq(
      1L -> Array(1.0f, 0.0f, 0.0f, 0.0f),
      2L -> Array(0.99f, 0.01f, 0.0f, 0.0f),
      3L -> Array(0.0f, 1.0f, 0.0f, 0.0f),
      4L -> Array(-1.0f, 0.0f, 0.0f, 0.0f),
      5L -> Array(0.5f, 0.5f, 0.5f, 0.5f),
      6L -> Array(0.9f, 0.3f, 0.1f, 0.0f))
    val byId = vs.toMap
    val lam = 0.7
    def refMmr(qid: Long, kCand: Int, m: Int): Seq[(Long, Long)] = {
      val q = byId(qid)
      val cands = vs.filterNot(_._1 == qid)
        .map { case (id, v) => (id, cosRef(q, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(kCand)
      var selected = Vector.empty[Long]
      (1 to m).map { rank =>
        val scored = cands.filterNot(c => selected.contains(c._1)).map {
          case (id, s) =>
            val pen = if (selected.isEmpty) 0.0
              else selected.map(sid => cosRef(byId(id), byId(sid))).max
            (id, lam * s - (1 - lam) * pen)
        }
        val pickId = scored.minBy { case (id, sc) => (-sc, id) }._1
        selected :+= pickId
        (rank.toLong, pickId)
      }
    }
    val emb6 = vs.toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(emb6, "vec_id", "embedding",
        col("vec_id") <= 2L, kCand = 4, m = 3, lambda = lam)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = Seq(1L, 2L).flatMap(q =>
      refMmr(q, 4, 3).map { case (rk, id) => (q, rk, id) })
    got.toSeq shouldBe want
  }

  "inertiaReport" should "sum fixed-point within-cell SSE exactly (hand-computed)" in {
    val cents = Array((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
                      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }
    def q(a: Array[Float], b: Array[Float]): Long =
      math.floor(l2(a, b) * 1048576.0).toLong
    // assignment is the cosine argmax: v1,v2 -> c1; v3,v4 -> c3
    val v2 = Array(0.99f, 0.01f, 0.0f, 0.0f)
    val v4 = Array(-1.0f, 0.0f, 0.0f, 0.0f)
    val sse1 = q(v2, cents(0)._2)               // v1 contributes 0
    val sse3 = q(v4, cents(1)._2)               // v3 contributes 0
    val tot = (sse1 + sse3).toDouble
    val out = Similarity.inertiaReport(emb, "vec_id", "embedding", cents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    out.toSeq shouldBe Seq(
      (1L, 2L, sse1, sse1.toDouble / (2L * 1048576L).toDouble, sse1 / tot),
      (3L, 2L, sse3, sse3.toDouble / (2L * 1048576L).toDouble, sse3 / tot))
  }

  "assignmentChurn" should "flag exactly the vectors whose argmax cell changes" in {
    val centsOld = Array((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
                         (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
    // retrain replaces cell 3's centroid with v4's direction: v3 now
    // prefers... cos(v3, c3new) = 0 vs cos(v3, c1) = 0 -> tie toward the
    // smaller cent_id, so v3 migrates to cell 1; v4 migrates to 3.
    val centsNew = Array((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
                         (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)))
    val out = Similarity.assignmentChurn(emb, "vec_id", "embedding", centsOld, centsNew)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    out.toSeq shouldBe Seq(
      (1L, 1L, 1L, false), (2L, 1L, 1L, false),
      (3L, 3L, 1L, true), (4L, 3L, 3L, false))
  }

  it should "report zero churn when the quantizer is unchanged" in {
    val cents = Array((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
                      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
    Similarity.assignmentChurn(emb, "vec_id", "embedding", cents, cents)
      .filter(col("moved")).count() shouldBe 0
  }

  it should "keep everything at dropPct = 0 and reject an out-of-range percentage" in {
    val cents = Array((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
    Similarity.prototypicalityPrune(emb, "vec_id", "embedding", cents, dropPct = 0)
      .filter(!col("kept")).count() shouldBe 0
    an[IllegalArgumentException] should be thrownBy
      Similarity.prototypicalityPrune(emb, "vec_id", "embedding", cents, dropPct = 101)
  }
}
