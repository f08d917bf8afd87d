package graft.multimodal

import graft.SparkSpec

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  "assets" should "generate formula-exact binary content with typed metadata" in {
    val a = Media.mkAsset(5L)
    a.content.length shouldBe 256 + (5 % 7) * 128
    (a.content(3) & 0xFF) shouldBe ((5 * 31 + 7 * 9) % 256)
    a.kind shouldBe "video" // 5 % 3 == 2
    a.meta.format shouldBe "rawv"
    val ds = Media.assets(spark, sfDir)
    ds.count() shouldBe 500
    ds.filter(_.asset_id == 5L).head().content shouldBe a.content
  }

  "stats" should "match the closed form for a known asset" in {
    val r = Media.stats(Media.assets(spark, sfDir))
      .filter($"asset_id" === 0L).collect().head
    val expected = (0 until 256).map(i => (7L * i * i % 256).toInt)
    r.getAs[Long]("n_bytes") shouldBe 256L
    r.getAs[Double]("mean_byte") shouldBe expected.sum.toDouble / 256
    r.getAs[Long]("min_byte") shouldBe expected.min.toLong
    r.getAs[Long]("max_byte") shouldBe expected.max.toLong
  }

  "exactFeatureDedup" should "merge duplicate assets and keep distinct ones apart" in {
    // ids differing by 1792 (≡ 0 mod 7 and mod 256) generate identical
    // content — duplicate uploads under different ids.
    val trio = Seq(Media.mkAsset(5L), Media.mkAsset(1797L), Media.mkAsset(7L))
    trio.head.content shouldBe trio(1).content
    trio.head.content should not be trio(2).content
    val out = Media.exactFeatureDedup(spark.createDataset(trio)).collect()
    val merged = out.find(_.getAs[Long]("n_copies") == 2L)
    merged.isDefined shouldBe true
    merged.get.getAs[Long]("keep_id") shouldBe 5L
    out.map(_.getAs[Long]("n_copies")).sum shouldBe 3L
  }

  "frameSample" should "slice video content into sampled fixed-size frames" in {
    val out = Media.frameSample(Media.assets(spark, sfDir), frameBytes = 64, every = 4)
    val byAsset = out.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byAsset.keySet.foreach(id => (id % 3) shouldBe 2) // only video assets
    // asset 5: 896 bytes → 14 frames of 64 → sampled idx 0,4,8,12 → 4
    byAsset(5L) shouldBe 4L
    out.filter($"asset_id" === 5L && $"frame_idx" === 0L)
      .collect().head.getAs[Array[Byte]]("frame").length shouldBe 64
  }

  "decode" should "batch per partition through the decoder seam" in {
    val out = Media.decode(Media.assets(spark, sfDir), new DeterministicFakeDecoder)
      .collect()
    out.length shouldBe 500
    val video = out.find(_.asset_id == 5L).get
    video.nFrames shouldBe (Media.mkAsset(5L).meta.durationMs / 40L).toInt
  }

  "perceptualNearDup" should "recover every planted variant within the threshold" in {
    val pairs = Media.perceptualNearDup(Media.perceptualCorpus(spark, sfDir))
      .collect()
    val planted = pairs.filter(r =>
      r.getAs[Long]("asset_b") - r.getAs[Long]("asset_a") == Media.VariantOffset)
    // one variant per id ≡ 0 (mod 4) over 500 ids → 125 planted pairs
    planted.length shouldBe 125
    // the +16 nudge moves ≤2 raster pixels and shifts the mean by 32/64,
    // so a few borderline pixels may flip too — all stay well inside the
    // band-blocked threshold
    planted.foreach { r =>
      r.getAs[Long]("hamming_a") should be <= 6L
      r.getAs[Long]("hamming_d") should be <= 6L
    }
  }

  it should "catch what exact-histogram dedup structurally misses" in {
    // a planted variant moves a few bytes between histogram bins, so the
    // exact-feature pass (p31's semantics) sees base and variant as
    // DIFFERENT — while the perceptual pass pairs them (previous test)
    val corpus = Media.perceptualCorpus(spark, sfDir)
    val feats = Media.histogramFeatures(corpus)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val bases = feats.keys.filter(_ < Media.VariantOffset)
      .filter(id => feats.contains(id + Media.VariantOffset))
    // the +16 nudge moves every perturbed byte a full histogram bin, so
    // EVERY variant's histogram differs from its base — the exact pass
    // misses all 125, the perceptual pass catches all 125 (previous test)
    bases should have size 125
    bases.foreach(id => feats(id) should not equal feats(id + Media.VariantOffset))
  }

  it should "have EXACT recall at the default threshold (8-band pigeonhole)" in {
    // 8 bands of 8 bits: a pair with hamming_a ≤ 7 cannot differ in all
    // 8 bands, so banding drops nothing at maxHamming = 6 — compare
    // against a blocking-free ground truth computed from the hashes
    val h = Media.perceptualHashes(Media.perceptualCorpus(spark, sfDir)).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        (0 until 4).map(j => r.getAs[Int](s"a$j")).toArray).sortBy(_._1)
    val truth = (for {
      i <- h.indices.iterator
      j <- (i + 1) until h.length
      ham = (0 until 4).map(k =>
        Integer.bitCount(h(i)._2(k) ^ h(j)._2(k))).sum
      if ham <= 6
    } yield (h(i)._1, h(j)._1)).toSet
    val mined = Media.perceptualNearDup(Media.perceptualCorpus(spark, sfDir))
      .collect().map(r =>
        (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"))).toSet
    mined shouldBe truth
  }

  it should "cap the degenerate all-zero-hash bucket before it goes quadratic" in {
    // half of degenerateCorpus is constant rasters — one bucket in every
    // band. Capped: the flat population contributes nothing; uncapped
    // truth holds its quadratic pair mass. p124 oracle-verifies the
    // counts; this pins the mechanism.
    val corpus = Media.degenerateCorpus(spark, sfDir)
    val capped = Media.perceptualNearDup(corpus, maxHamming = 6, maxBucket = 100)
      .collect()
    capped.count(r => r.getAs[Long]("asset_a") >= Media.FlatOffset) shouldBe 0
    val bite = Media.perceptualCapBite(corpus, maxHamming = 6, maxBucket = 100)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_pairs")).toMap
    bite("capped") shouldBe capped.length.toLong
    // 250 flat assets → 250·249/2 identical pairs the cap refuses
    bite("uncapped") - bite("capped") should be >= (250L * 249 / 2)
  }

  "phashes" should "match a direct integer-DCT recomputation" in {
    val h = Media.phashes(Media.perceptualCorpus(spark, sfDir))
      .filter($"asset_id" === 3L).collect().head
    val c = Media.mkPerceptual(3L).content
    val f = Array.tabulate(8, 8)((u, v) =>
      (0 until 256).map(i => (c(i) & 0xFF).toLong *
        Media.DctBasis(u)(i % 16) * Media.DctBasis(v)(i / 16)).sum)
    val ac = (for (u <- 0 until 8; v <- 0 until 8 if (u, v) != ((0, 0)))
      yield f(u)(v))
    val tot = ac.sum
    val words = new Array[Int](4)
    ac.zipWithIndex.foreach { case (x, bi) =>
      if (x * 63L > tot) words(bi / 16) |= 1 << (bi % 16)
    }
    (0 until 4).foreach(j => h.getAs[Int](s"p$j") shouldBe words(j))
  }

  "phashRecovery" should "agree with the actual miners on the planted dither pairs" in {
    val corpus = Media.ditherCorpus(spark, sfDir)
    val recovered = Media.phashRecovery(corpus).collect()
      .map(r => (r.getAs[Long]("asset_id"),
        r.getAs[Long]("asset_id") + Media.DitherOffset)).toSet
    recovered should not be empty
    // the aHash miner (hamming_a <= 6 gate) finds NONE of the recovered
    // pairs — they are exactly the pairs it misses
    val aPairs = Media.perceptualNearDup(corpus).collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"))).toSet
    recovered.intersect(aPairs) shouldBe empty
    // the pHash banded miner finds EVERY recovered pair (pigeonhole:
    // Hamming <= 6 over 8 bands guarantees a shared band; no band
    // bucket tops the default cap at this scale)
    val pPairs = Media.phashNearDup(corpus).collect()
      .map(r => (r.getAs[Long]("asset_a"), r.getAs[Long]("asset_b"))).toSet
    recovered.diff(pPairs) shouldBe empty
  }

  "perceptualHashes" should "pack band bits in ascending bit order" in {
    // asset whose raster is known: verify band packing against a direct
    // recomputation in the test
    val h = Media.perceptualHashes(Media.perceptualCorpus(spark, sfDir))
      .filter($"asset_id" === 3L).collect().head
    val r = Array.tabulate(65)(i => Media.mkPerceptual(3L).content(i) & 0xFF)
    val s = r.take(64).map(_.toLong).sum
    def band(bit: Int => Boolean, j: Int): Int =
      (0 until 16).foldLeft(0)((v, k) => if (bit(16 * j + k)) v | (1 << k) else v)
    (0 until 4).foreach { j =>
      h.getAs[Int](s"a$j") shouldBe band(i => r(i) * 64L > s, j)
      h.getAs[Int](s"d$j") shouldBe band(i => r(i) > r(i + 1), j)
    }
  }
}
