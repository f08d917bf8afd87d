package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Typed metadata for an opaque media payload. */
final case class MediaMeta(format: String, width: Int, height: Int,
                           sampleRateHz: Int, durationMs: Long)

/** One multimodal row: media as an opaque binary column + typed metadata —
  * the schema shape a 100 TB training-data lake stores (never decoded
  * blobs; decode happens per-partition at read time). */
final case class MediaAsset(asset_id: Long, kind: String,
                            content: Array[Byte], meta: MediaMeta)

/** A decoded image/audio/video surface. Only the stub implementation
  * exists in this environment (see [[DeterministicFakeDecoder]]). */
final case class Decoded(asset_id: Long, width: Int, height: Int, nFrames: Int)

/** The decode seam: a real deployment binds an image/audio library here
  * (per-partition construction, batched input — the expensive native
  * resources are amortized across a partition, the Spark-side batch shape
  * is exactly what a vectorized decoder wants). The container has no media
  * libraries, so the only implementation is an explicitly-marked
  * deterministic fake; everything AROUND the seam — schema, partitioning,
  * per-partition batching, feature plumbing — is real and tested. */
trait MediaDecoder extends Serializable {
  def decode(batch: Iterator[MediaAsset]): Iterator[Decoded]
}

/** STUB decoder — deterministic fake standing in for libjpeg/ffmpeg.
  * Derives plausible dimensions from the metadata instead of parsing the
  * bytes. Marked loudly so nobody mistakes it for a real codec. */
final class DeterministicFakeDecoder extends MediaDecoder {
  def decode(batch: Iterator[MediaAsset]): Iterator[Decoded] =
    batch.map { a =>
      Decoded(a.asset_id, a.meta.width, a.meta.height,
        if (a.kind == "video") (a.meta.durationMs / 40L).toInt else 1)
    }
}

/** Multimodal operators over binary media columns. The synthetic asset
  * corpus is formula-generated executor-side (no driver materialization),
  * which lets DuckDB verify the byte-level pipeline from the closed form:
  * the Spark side computes statistics from the REAL binary column, the
  * oracle recomputes them from the generating formula — they match only if
  * every byte survived the pipeline.
  */
object Media {

  /** Deterministic synthetic corpus keyed by the embeddings table's ids:
    * content[i] = (id*31 + 7i²) mod 256, length 256 + (id mod 7)*128.
    * The quadratic term makes byte histograms id-dependent (pure linear
    * strides are uniform and every asset would look identical). */
  def assets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).select(col("vec_id")).as[Long]
      .mapPartitions(_.map(mkAsset))
  }

  private[multimodal] def mkAsset(id: Long): MediaAsset = {
    val n = 256 + (id % 7).toInt * 128
    val bytes = Array.tabulate(n)(i => ((id * 31 + 7L * i * i) % 256).toByte)
    val kind = (id % 3) match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    val meta = kind match {
      case "image" => MediaMeta("png", 16 + (id % 16).toInt, 16 + (id % 9).toInt, 0, 0L)
      case "audio" => MediaMeta("pcm", 0, 0, 16000, n.toLong * 8)
      case _       => MediaMeta("rawv", 8, 8, 0, n.toLong * 40)
    }
    MediaAsset(id, kind, bytes, meta)
  }

  /** Per-asset byte statistics computed from the binary column — the
    * canonical "feature-extract" batch shape (per-partition iterator, no
    * per-row JVM↔native crossings once a real decoder is bound). */
  def stats(assets: Dataset[MediaAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      var sum = 0L; var mn = 255; var mx = 0
      a.content.foreach { b =>
        val u = b & 0xFF
        sum += u; if (u < mn) mn = u; if (u > mx) mx = u
      }
      (a.asset_id, a.kind, a.content.length.toLong,
        sum.toDouble / a.content.length, mn.toLong, mx.toLong)
    }).toDF("asset_id", "kind", "n_bytes", "mean_byte", "min_byte", "max_byte")
      .orderBy("asset_id")
  }

  /** 16-bin byte-histogram fractions — the embedding a fake "visual"
    * featurizer produces; feeds the same similarity machinery as text
    * embeddings. */
  def histogramFeatures(assets: Dataset[MediaAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val counts = new Array[Long](16)
      a.content.foreach(b => counts((b & 0xFF) / 16) += 1)
      (a.asset_id, counts.map(_.toDouble / a.content.length).toSeq)
    }).toDF("asset_id", "features")
  }

  /** Exact-feature media dedup: assets whose byte histograms are identical
    * (same content distribution — e.g. the same image re-encoded with a
    * shifted palette). Hash-groupBy on the feature vector — one shuffle,
    * never all-pairs, the exact-dedup pattern at any corpus size. */
  def exactFeatureDedup(assets: Dataset[MediaAsset]): DataFrame =
    histogramFeatures(assets)
      .groupBy("features")
      .agg(min("asset_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  /** Frame sampling for video assets: every `every`-th fixed-size byte
    * window — the Spark-side plumbing of frame extraction (a real build
    * hands each window to the decoder seam). Output: one row per sampled
    * frame with its own binary column. */
  def frameSample(assets: Dataset[MediaAsset], frameBytes: Int = 64,
                  every: Int = 4): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      a.content.grouped(frameBytes).zipWithIndex
        .filter { case (_, idx) => idx % every == 0 }
        .map { case (frame, idx) => (a.asset_id, idx.toLong, frame) }
    }.toDF("asset_id", "frame_idx", "frame")
  }

  /** Frame-window statistics from the REAL binary column — byte count and
    * byte sum per sampled frame, so the oracle (recomputing both from the
    * generating formula) verifies the WINDOW BOUNDARIES of the sampler
    * exactly: an off-by-one in the window split or the stride changes
    * some window's sum. Integers only. */
  def frameWindowStats(assets: Dataset[MediaAsset], frameBytes: Int = 64,
                       every: Int = 4): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      a.content.grouped(frameBytes).zipWithIndex
        .filter { case (_, idx) => idx % every == 0 }
        .map { case (frame, idx) =>
          (a.asset_id, idx.toLong, frame.length.toLong,
            frame.foldLeft(0L)((s, b) => s + (b & 0xFF)))
        }
    }.toDF("asset_id", "frame_idx", "n_bytes", "byte_sum")
      .orderBy("asset_id", "frame_idx")
  }

  /** Decode through the seam (stubbed here) — per-partition batching. */
  def decode(assets: Dataset[MediaAsset], decoder: MediaDecoder): Dataset[Decoded] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(decoder.decode)
  }

  /** Planted-variant id offset for [[perceptualCorpus]]. */
  val VariantOffset = 1000000L

  /** Which byte positions a planted variant perturbs (+16 mod 256 — a
    * full histogram bin, so the exact-feature pass always sees a
    * different histogram, while only ≤ 2 of 64 raster pixels move). */
  private def perturbed(i: Int): Boolean = i % 64 == 1

  /** Raster bytes for the perceptual corpus:
    * (id·31 + 7i² + (id mod 13)·i) mod 256. DELIBERATELY NOT
    * [[mkAsset]]'s formula: that one makes every asset the same
    * quadratic pattern offset by id·31 — i.e. a pure brightness shift of
    * one image — and aHash is brightness-shift-INVARIANT by design, so
    * near-all-pairs matched (measured 20.9k pairs over 625 assets). The
    * per-id gradient term (id mod 13)·i breaks the shift family while
    * staying closed-form for the oracle. */
  private[multimodal] def mkPerceptual(id: Long): MediaAsset = {
    val base = mkAsset(id)
    val bytes = Array.tabulate(base.content.length)(i =>
      ((id * 31 + 7L * i * i + (id % 13) * i) % 256).toByte)
    base.copy(content = bytes)
  }

  private[multimodal] def mkVariant(id: Long): MediaAsset = {
    val base = mkPerceptual(id)
    val bytes = base.content.zipWithIndex.map { case (b, i) =>
      if (perturbed(i)) (((b & 0xFF) + 16) % 256).toByte else b
    }
    base.copy(asset_id = id + VariantOffset, content = bytes)
  }

  /** The perceptual-dedup corpus: every asset (perceptual raster
    * formula), plus a PLANTED near-duplicate variant for each id ≡ 0
    * (mod 4) — the base content with a handful of bytes nudged by +16
    * (every 64th, offset 1). A variant's byte HISTOGRAM differs (so
    * [[exactFeatureDedup]] misses it — its charter) while its perceptual
    * hashes stay within a few bits (what [[perceptualNearDup]] exists to
    * catch). Deterministic, so the oracle regenerates both populations
    * from the closed form. */
  def perceptualCorpus(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    val ids = Tables.embeddings(spark, dir).select(col("vec_id")).as[Long]
    ids.mapPartitions(_.map(mkPerceptual))
      .union(ids.filter(_ % 4 == 0).mapPartitions(_.map(mkVariant)))
  }

  /** Id offset for the degenerate flat assets of [[degenerateCorpus]]. */
  val FlatOffset = 2000000L

  /** A constant-raster asset: every byte 42 — aHash and dHash are both
    * all-zero (no pixel exceeds the mean, no positive gradient), so ALL
    * flat assets collide in EVERY band: the degenerate-band failure the
    * hot-bucket cap exists for (the file's scaladoc history records the
    * shift-invariant corpus hitting exactly this). */
  private[multimodal] def mkFlat(id: Long): MediaAsset = {
    val base = mkAsset(id)
    base.copy(asset_id = id + FlatOffset,
      content = Array.fill(base.content.length)(42.toByte))
  }

  /** [[perceptualCorpus]] plus a planted DEGENERATE population: a flat
    * (constant-raster) asset for every even id — half the corpus shares
    * one all-zero aHash bucket, which would contribute m²/2 candidate
    * pairs inside one task if the banded self-join ran uncapped. The
    * p123/p124 queries run over this corpus to prove the cap bites. */
  def degenerateCorpus(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    val ids = Tables.embeddings(spark, dir).select(col("vec_id")).as[Long]
    perceptualCorpus(spark, dir)
      .union(ids.filter(_ % 2 == 0).mapPartitions(_.map(mkFlat)))
  }

  /** Cap-bite evidence (the p94-vs-p98 convention, folded to counts so
    * the verified output stays bounded): the pair count of the capped
    * configuration beside the uncapped ground truth over the same
    * corpus. On [[degenerateCorpus]] the delta is the flat population's
    * quadratic pair mass — the candidates the cap refuses to enumerate. */
  def perceptualCapBite(assets: Dataset[MediaAsset], maxHamming: Int,
                        maxBucket: Int): DataFrame = {
    // one hash pass for BOTH configs: the capped and uncapped miners
    // differ only in the bucket-eligibility filter, so they share the
    // materialized hash frame (each miner alone reads it 3×, see
    // perceptualNearDup — 6 synthesis+hash passes collapse to 1)
    val h = perceptualHashes(assets).localCheckpoint()
    val capped = aHashNearDupFromHashes(h, maxHamming, maxBucket)
      .agg(count(lit(1)).as("n_pairs"))
      .select(lit("capped").as("config"), col("n_pairs"))
    val uncapped = aHashNearDupFromHashes(h, maxHamming, Int.MaxValue)
      .agg(count(lit(1)).as("n_pairs"))
      .select(lit("uncapped").as("config"), col("n_pairs"))
    capped.unionByName(uncapped).orderBy("config")
  }

  /** aHash + dHash over the asset's leading 8×8 byte raster, packed as
    * 4 × 16-bit bands each (the SimHash banding convention, sized so a
    * near-duplicate — a few flipped bits — still agrees on ≥ 1 band):
    *
    *  - aHash (average hash): bit i set iff raster(i)·64 > Σ raster —
    *    the integer cross-multiplied form of "pixel above mean", no
    *    division, so the oracle replays it exactly;
    *  - dHash (difference hash): bit i set iff raster(i) > raster(i+1)
    *    (gradient sign — robust to uniform brightness shifts).
    *
    * Both are the DCT-free members of the standard perceptual-hash
    * family (pHash's DCT needs float transforms an oracle can't replay
    * bit-exactly). Row-local integer work in the per-partition batch
    * shape; at a real deployment the raster comes from the decoder seam
    * (resize-to-8×8 grayscale) instead of the leading bytes. */
  def perceptualHashes(assets: Dataset[MediaAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val r = Array.tabulate(65)(i => a.content(i) & 0xFF)
      var s = 0L
      var i = 0
      while (i < 64) { s += r(i); i += 1 }
      def band(bit: Int => Boolean, j: Int): Int = {
        var v = 0
        var k = 0
        while (k < 16) { if (bit(16 * j + k)) v |= 1 << k; k += 1 }
        v
      }
      val ab = Array.tabulate(4)(band(i => r(i) * 64L > s, _))
      val db = Array.tabulate(4)(band(i => r(i) > r(i + 1), _))
      (a.asset_id, ab(0), ab(1), ab(2), ab(3), db(0), db(1), db(2), db(3))
    }).toDF("asset_id", "a0", "a1", "a2", "a3", "d0", "d1", "d2", "d3")
  }

  /** Id offset for the planted high-frequency-dither variants of
    * [[ditherCorpus]]. */
  val DitherOffset = 3000000L

  /** Dither amplitude: ±32 flips a solid majority of the planted pairs
    * past the aHash miner's Hamming-6 gate (measured: 84 of 125 planted
    * pairs at sf0.01 are pHash-only recoveries) while the pHash distance
    * stays low (median 2). */
  val DitherAmp = 32

  /** A planted high-frequency DITHER variant: the leading 64 bytes (the
    * aHash window) nudged by an alternating ±[[DitherAmp]], CLAMPED to
    * [0, 255] (a mod-256 wrap would inject broadband energy and defeat
    * the construction). The checkerboard is a horizontal-Nyquist
    * pattern: its energy sits at the top of the spectrum, far outside
    * the 8×8 low-frequency block [[phashes]] keeps — the JPEG-noise
    * archetype pHash is published to survive — while every dithered
    * pixel moves by up to ±32, flipping the above-mean aHash bits of
    * pixels near the mean. */
  private[multimodal] def mkDither(id: Long): MediaAsset = {
    val base = mkPerceptual(id)
    val bytes = base.content.zipWithIndex.map { case (b, i) =>
      if (i < 64) {
        val d = if (i % 2 == 0) DitherAmp else -DitherAmp
        math.min(255, math.max(0, (b & 0xFF) + d)).toByte
      } else b
    }
    base.copy(asset_id = id + DitherOffset, content = bytes)
  }

  /** [[perceptualCorpus]] plus a planted DITHER variant for every id ≡ 2
    * (mod 4) — disjoint from the histogram-variant population (id ≡ 0
    * mod 4), so each planted family isolates one transform. The p167/
    * p168 fixture: aHash misses most dither pairs (Hamming > 6), pHash
    * recovers them. */
  def ditherCorpus(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    val ids = Tables.embeddings(spark, dir).select(col("vec_id")).as[Long]
    perceptualCorpus(spark, dir)
      .union(ids.filter(_ % 4 == 2).mapPartitions(_.map(mkDither)))
  }

  /** Fixed-point 16-point DCT-II basis, rows u = 0..7: T(u)(x) =
    * round(cos(π(2x+1)u/32) · 1024). INTEGER by construction, so the
    * 2-D transform below is exact long arithmetic on both engines (a
    * float DCT could not be oracle-compared bit-for-bit — the published
    * pHash recipe's only non-integer step, replaced by the same
    * fixed-point quantization both sides bake in at build time; the
    * oracle twin's literal table is generated from THIS array). */
  private[graft] val DctBasis: Array[Array[Long]] =
    Array.tabulate(8, 16)((u, x) =>
      math.round(math.cos(math.Pi * (2 * x + 1) * u / 32.0) * 1024.0))

  /** pHash (DCT perceptual hash, Zauner 2010) over the asset's leading
    * 16×16 byte raster: 2-D fixed-point DCT ([[DctBasis]]), keep the 8×8
    * low-frequency block, drop DC, bit b = (coefficient · 63 > Σ AC) —
    * the cross-multiplied integer form of "above the AC mean", no
    * division. 63 bits packed into 4 × 16-bit words (p0..p3, bit index
    * u·8+v−1 in u-major order). The published recipe rasterizes
    * 32×32 → 8×8; the smallest synthetic asset is 256 bytes, so the
    * raster here is 16×16 — the decode/resize seam that would produce a
    * real 32×32 grayscale is the stubbed [[MediaDecoder]], per the
    * multimodal charter. Row-local integer work in the per-partition
    * batch shape, exactly like [[perceptualHashes]].
    *
    * Robustness vs aHash/dHash: brightness shifts die in the dropped DC
    * and the mean threshold; high-frequency dither (JPEG noise, the
    * [[mkDither]] fixture) lands outside the kept block — while aHash,
    * thresholding raw pixels, flips a bit for every dithered pixel near
    * the mean (p168 pins the recovery delta). */
  def phashes(assets: Dataset[MediaAsset]): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val f = new Array[Long](64) // u*8+v
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var acc = 0L
          var i = 0
          while (i < 256) {
            acc += (a.content(i) & 0xFF).toLong *
              DctBasis(u)(i % 16) * DctBasis(v)(i / 16)
            i += 1
          }
          f(u * 8 + v) = acc
          v += 1
        }
        u += 1
      }
      var tot = 0L
      var k = 1
      while (k < 64) { tot += f(k); k += 1 }
      val words = new Array[Int](4)
      k = 1
      while (k < 64) {
        val bi = k - 1
        if (f(k) * 63L > tot) words(bi / 16) |= 1 << (bi % 16)
        k += 1
      }
      (a.asset_id, words(0), words(1), words(2), words(3))
    }).toDF("asset_id", "p0", "p1", "p2", "p3")
  }

  /** pHash near-duplicate pairs — [[perceptualNearDup]]'s plan shape
    * over the DCT hash: EIGHT 8-bit blocking bands from p0..p3 (63
    * significant bits, so a pair within Hamming 7 still shares ≥ 1 band
    * — the same pigeonhole bound), hot buckets above `maxBucket` skipped
    * before the self-join, full 63-bit Hamming verify on the surviving
    * deduped candidates. Output: (asset_a, asset_b, hamming_p) for
    * hamming_p ≤ `maxHamming`, ordered. */
  def phashNearDup(assets: Dataset[MediaAsset],
                   maxHamming: Int = 6,
                   maxBucket: Int = graft.text.TextDedup.DefaultMaxBucket)
      : DataFrame = {
    // localCheckpoint: same 3-consumer hash reuse as perceptualNearDup
    val h = phashes(assets).localCheckpoint()
    val banded = h.select(col("asset_id"), explode(array(
      (0 until 8).map { j =>
        val word = col(s"p${j / 2}")
        val bv = if (j % 2 == 0) word.bitwiseAND(lit(255))
                 else shiftright(word, 8)
        struct(lit(j).as("bi"), bv.as("bv"))
      }: _*)).as("b"))
      .select(col("asset_id"), col("b.bi").as("bi"), col("b.bv").as("bv"))
    val eligible = banded.groupBy("bi", "bv")
      .agg(count(lit(1)).as("__m")).filter(col("__m") <= maxBucket)
      .select("bi", "bv")
    val capped = banded.join(eligible, Seq("bi", "bv"))
    val pairs = capped.as("x").join(capped.as("y"), Seq("bi", "bv"))
      .filter(col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("asset_a"), col("y.asset_id").as("asset_b"))
      .distinct()
    def ham: Column =
      (0 until 4).map(j => bit_count(col(s"p${j}_x").bitwiseXOR(col(s"p${j}_y"))))
        .reduce(_ + _).cast("long")
    val hx = h.columns.foldLeft(h)((d, c) =>
      if (c == "asset_id") d else d.withColumnRenamed(c, c + "_x"))
    val hy = h.columns.foldLeft(h)((d, c) =>
      if (c == "asset_id") d else d.withColumnRenamed(c, c + "_y"))
    pairs
      .join(hx.withColumnRenamed("asset_id", "asset_a"), Seq("asset_a"))
      .join(hy.withColumnRenamed("asset_id", "asset_b"), Seq("asset_b"))
      .select(col("asset_a"), col("asset_b"), ham.as("hamming_p"))
      .filter(col("hamming_p") <= maxHamming)
      .orderBy("asset_a", "asset_b")
  }

  /** The p168 recovery report: planted dither pairs (base, base +
    * [[DitherOffset]]) that the aHash miner MISSES (aHash Hamming > 6 —
    * [[perceptualNearDup]] filters `hamming_a <= 6`, so such a pair
    * provably cannot appear in its output) and pHash RECOVERS (pHash
    * Hamming ≤ 6 — within [[phashNearDup]]'s pigeonhole bound, so the
    * banded miner finds it wherever no shared band is capped;
    * PhashSpec cross-checks both claims against the actual miners).
    * Output: (asset_id, hamming_a, hamming_p) per recovered pair. */
  def phashRecovery(assets: Dataset[MediaAsset], maxHamming: Int = 6)
      : DataFrame = {
    val a = perceptualHashes(assets)
    val p = phashes(assets)
    // localCheckpoint: base and dith both read this frame, and the two
    // opaque hashing passes would otherwise run twice each
    val h = a.join(p, "asset_id").localCheckpoint()
    val base = h.columns.foldLeft(h)((d, c) =>
      if (c == "asset_id") d else d.withColumnRenamed(c, c + "_x"))
    val dith = h.columns.foldLeft(h)((d, c) =>
      if (c == "asset_id") d else d.withColumnRenamed(c, c + "_y"))
      .withColumn("asset_id", col("asset_id") - lit(DitherOffset))
    def ham(w: String): Column =
      (0 until 4).map(j => bit_count(col(s"$w${j}_x").bitwiseXOR(col(s"$w${j}_y"))))
        .reduce(_ + _).cast("long")
    base.join(dith, "asset_id")
      .select(col("asset_id"), ham("a").as("hamming_a"), ham("p").as("hamming_p"))
      .filter(col("hamming_p") <= maxHamming && col("hamming_a") > maxHamming)
      .orderBy("asset_id")
  }

  /** Perceptual near-duplicate pairs: candidates share at least one of
    * EIGHT 8-bit aHash bands — sized to the threshold: a pair differing
    * in ≤ 7 of 64 bits cannot differ in all 8 bands (pigeonhole), so for
    * the default `maxHamming` = 6 the blocking is EXACT (the LSH
    * OR-construction guarantee; the round-13 4×16-bit banding only
    * guaranteed recall to Hamming 3 and was silently approximate above
    * it). Candidates are verified by the full 64-bit Hamming distance
    * via XOR + bit_count per word. Output: (asset_a, asset_b, hamming_a,
    * hamming_d) for hamming_a ≤ `maxHamming`, ordered. For
    * `maxHamming` ≥ 8 recall is approximate (a qualifying pair can
    * spread its bits across all bands).
    *
    * Scale shape: the banded frame carries (id, band_idx, band_val)
    * only; the self-join keys on the band pair, hashes rejoin by id for
    * the surviving deduped candidates (the nearDupPairs plan shape), and
    * the Hamming verify is 8 codegen'd XOR+popcounts per pair. Band
    * buckets above `maxBucket` are skipped BEFORE the self-join — the
    * house hot-bucket cap every banded miner applies (a degenerate band
    * value, e.g. the all-zero aHash of near-constant rasters, otherwise
    * contributes m² candidate pairs inside one task); the cap is
    * oracle-mirrored, and the p124 twin proves where it bites. */
  def perceptualNearDup(assets: Dataset[MediaAsset],
                        maxHamming: Int = 6,
                        maxBucket: Int = graft.text.TextDedup.DefaultMaxBucket)
      : DataFrame =
    // localCheckpoint: the hash frame feeds the banding AND both rejoin
    // sides, and the hashing mapPartitions is opaque to exchange reuse —
    // uncheckpointed, the asset synthesis + hashing pass runs 3×. The
    // frame is 5 fixed-width ints per asset, never payload-sized, so
    // materializing it once is the decode-once contract of guide §8.
    aHashNearDupFromHashes(perceptualHashes(assets).localCheckpoint(),
      maxHamming, maxBucket)

  /** [[perceptualNearDup]] over an already-materialized
    * [[perceptualHashes]] frame — shared with [[perceptualCapBite]] so
    * the capped and uncapped configs hash the corpus ONCE between them. */
  private def aHashNearDupFromHashes(h: DataFrame, maxHamming: Int,
                                     maxBucket: Int): DataFrame = {
    val banded = h.select(col("asset_id"), explode(array(
      (0 until 8).map { j =>
        val word = col(s"a${j / 2}")
        val bv = if (j % 2 == 0) word.bitwiseAND(lit(255))
                 else shiftright(word, 8)
        struct(lit(j).as("bi"), bv.as("bv"))
      }: _*)).as("b"))
      .select(col("asset_id"), col("b.bi").as("bi"), col("b.bv").as("bv"))
    // hot-bucket cap (the minhashNearDup pattern): partial-agg sizes,
    // then drop a hot bucket's m rows before they meet as m² pairs
    val eligible = banded.groupBy("bi", "bv")
      .agg(count(lit(1)).as("__m")).filter(col("__m") <= maxBucket)
      .select("bi", "bv")
    val capped = banded.join(eligible, Seq("bi", "bv"))
    val pairs = capped.as("x").join(capped.as("y"), Seq("bi", "bv"))
      .filter(col("x.asset_id") < col("y.asset_id"))
      .select(col("x.asset_id").as("asset_a"), col("y.asset_id").as("asset_b"))
      .distinct()
    def ham(p: String): Column =
      (0 until 4).map(j => bit_count(col(s"$p${j}_x").bitwiseXOR(col(s"$p${j}_y"))))
        .reduce(_ + _).cast("long")
    val hx = h.columns.foldLeft(h)((d, c) =>
      if (c == "asset_id") d else d.withColumnRenamed(c, c + "_x"))
    val hy = h.columns.foldLeft(h)((d, c) =>
      if (c == "asset_id") d else d.withColumnRenamed(c, c + "_y"))
    pairs
      .join(hx.withColumnRenamed("asset_id", "asset_a"), Seq("asset_a"))
      .join(hy.withColumnRenamed("asset_id", "asset_b"), Seq("asset_b"))
      .select(col("asset_a"), col("asset_b"),
        ham("a").as("hamming_a"), ham("d").as("hamming_d"))
      .filter(col("hamming_a") <= maxHamming)
      .orderBy("asset_a", "asset_b")
  }
}
