package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
}
