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
}
