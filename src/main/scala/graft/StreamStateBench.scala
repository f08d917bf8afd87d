package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{DedupGroupStream, SpanDedupStream, VersionedState}

/** Dev measurement for the round-9 incremental streaming state: streams a
  * synthetic corpus with a CONTROLLED novelty rate through
  * [[graft.streaming.SpanDedupStream]] and reports, per micro-batch, the
  * rows the state layer actually wrote (the delta / compact) next to what
  * the round-8 full-rewrite design would have written (the cumulative
  * seen-key table). The claim under test: per-batch state-write volume
  * tracks BATCH NOVELTY, not corpus history — on a long-running stream
  * the full-rewrite cost grows linearly with lifetime while the delta
  * cost stays flat at the ingest rate.
  *
  * Corpus: `batches` json chunks of `docsPerBatch` docs each, built from
  * [[ScaleCorpusBench.synthCorpus]]'s duplicate structure (10% exact +
  * 10% near dups), so every batch contributes a near-identical number of
  * novel span keys — the flat-ingest steady state.
  *
  * Run: `sbt "runMain graft.StreamStateBench [batches] [docsPerBatch]"`.
  * One JSON line per batch; curves land in bench_records/.
  */
object StreamStateBench {

  /** Fail loudly on timeout — a bench that proceeds past a still-running
    * stream would read a partially-written state dir and report
    * misleading per-batch rows. */
  private def awaitOrAbort(q: org.apache.spark.sql.streaming.StreamingQuery,
                           what: String, timeoutMs: Long = 1800000L): Unit = {
    val finished = q.awaitTermination(timeoutMs)
    if (!finished || q.isActive) {
      q.stop()
      sys.error(s"$what did not terminate within ${timeoutMs / 1000}s — " +
        "aborting instead of reading a partially-written state dir")
    }
  }

  /** (batchId → triggerExecution ms) for every batch the query ran —
    * the per-batch COMPUTE curve (state writes are measured separately
    * from the surviving version directories). Requires
    * numRecentProgressUpdates ≥ the batch count. */
  private def batchDurations(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Seq[(Long, Long)] =
    q.recentProgress.toSeq
      .map(p => p.batchId ->
        p.durationMs.getOrDefault("triggerExecution", -1L).longValue())
      .filter(_._1 >= 0).sortBy(_._1)

  /** Total bytes under a version directory — the state-size axis of the
    * 10M-key soak (round-14 verdict item 6). */
  private def dirBytes(spark: org.apache.spark.sql.SparkSession,
                       p: org.apache.hadoop.fs.Path): Long = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(12)
    val docsPerBatch = args.lift(1).map(_.toInt).getOrElse(2000)
    // 3rd arg: span-section compaction cadence. Default keeps the r9
    // measurement shape (suppressed — every version is a pure novelty
    // delta); the 10M-key soak passes the production 8 so the record
    // shows real compaction cadence + pruning, not just deltas.
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(-1)
    val spark = DevBench.session()
    // keep EVERY batch's progress so the per-batch compute curve covers
    // long soaks, not just the last 100 triggers
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (batches + 16).toString)

    // one id-ordered json file per future micro-batch (the
    // PackingStream/AsOfStream ordering contract)
    val corpus = ScaleCorpusBench
      .synthCorpus(spark, batches.toLong * docsPerBatch)
    val srcDir = Files.createTempDirectory("graft-ssb-src")
    val lines = corpus.orderBy("doc_id")
      .select(to_json(struct(col("doc_id"), col("text"))).as("l"))
      .collect().map(_.getString(0))
    lines.grouped(docsPerBatch).zipWithIndex.foreach { case (ls, i) =>
      val f = srcDir.resolve(f"docs-$i%04d.json")
      Files.write(f, String.join("\n", ls.toSeq: _*).getBytes("UTF-8"))
      f.toFile.setLastModified(1700000000000L + i * 60000L)
    }

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(srcDir.toString)

    val outDir = Files.createTempDirectory("graft-ssb-out").toString
    val stateDir = Files.createTempDirectory("graft-ssb-state").toString
    val ckpt = Files.createTempDirectory("graft-ssb-ckpt").toString
    // compactEvery above the batch count: every post-anchor batch writes
    // a pure novelty delta, so the state dir IS the measurement
    val t0 = System.nanoTime()
    val q = SpanDedupStream.attach(stream, "doc_id", "text", outDir,
      stateDir, ckpt,
      compactEvery = if (compactEvery > 0) compactEvery else batches + 1)
    awaitOrAbort(q, "SpanDedupStream bench query")
    val wall = (System.nanoTime() - t0) / 1e9

    // per-batch COMPUTE: at soak scale the question is whether batch
    // latency stays flat while the cumulative key count grows to 10M+
    batchDurations(q).foreach { case (id, ms) =>
      println(s"""{"op":"span_dedup_stream_compute","batch":$id,"trigger_ms":$ms}""")
    }
    // read the surviving versions: per batch, rows written (the delta)
    // vs the cumulative table a full rewrite would have written. Under
    // production compaction older versions are PRUNED, so cumulative is
    // only exact in the suppressed-compaction (r9 measurement) mode —
    // the JSON line carries the mode ("compact_every") and omits the
    // full-rewrite baseline when compaction is active, so a downstream
    // record can't quote an undercounted baseline (round-16 advice).
    val compactionActive = compactEvery > 0
    val vs = VersionedState.versions(spark, stateDir).sortBy(_.id)
    var cumulative = 0L
    vs.foreach { v =>
      val rows = spark.read.parquet(v.path.toString).count()
      cumulative += rows
      val kind = if (v.compact) "compact" else "delta"
      val baseline =
        if (compactionActive) s""""compact_every":$compactEvery"""
        else s""""full_rewrite_rows":$cumulative"""
      println(s"""{"op":"span_dedup_stream_state","batch":${v.id},""" +
        s""""kind":"$kind","rows_written":$rows,""" +
        s""""state_bytes":${dirBytes(spark, v.path)},""" +
        baseline + "}")
    }
    // cumulative distinct seen-key count — the soak's x-axis
    val seenKeys = SpanDedupStream.latestState(spark, stateDir)
      .map(_.count()).getOrElse(0L)
    println(s"""{"op":"span_dedup_stream","batches":$batches,""" +
      s""""docs_per_batch":$docsPerBatch,"seen_keys":$seenKeys,""" +
      s""""wall_sec":${f"$wall%.2f"}}""")

    // the second twin: DedupGroupStream over an edge stream with flat
    // novelty ([[ScaleCorpusBench.synthEdges]] sliced into id-ordered
    // chunks — each batch's edges mostly attach NEW nodes, the steady
    // state of a near-dup pair stream). Delta rows = labels the batch
    // added or changed; a full rewrite would write the whole cumulative
    // assignment every batch.
    val edgesPerBatch = docsPerBatch * 10
    val allEdges = ScaleCorpusBench
      .synthEdges(spark, batches.toLong * edgesPerBatch)
    val eDir = Files.createTempDirectory("graft-ssb-esrc")
    val eLines = allEdges
      .orderBy("doc_a", "doc_b")
      .select(to_json(struct(col("doc_a"), col("doc_b"))).as("l"))
      .collect().map(_.getString(0))
    eLines.grouped(edgesPerBatch).zipWithIndex.foreach { case (ls, i) =>
      val f = eDir.resolve(f"edges-$i%04d.json")
      Files.write(f, String.join("\n", ls.toSeq: _*).getBytes("UTF-8"))
      f.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    val eSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("doc_b",
        org.apache.spark.sql.types.LongType)))
    val eStream = spark.readStream.schema(eSchema)
      .option("maxFilesPerTrigger", 1).json(eDir.toString)
    val eState = Files.createTempDirectory("graft-ssb-estate").toString
    val eCkpt = Files.createTempDirectory("graft-ssb-eckpt").toString
    val t1 = System.nanoTime()
    // PRODUCTION compaction cadence here (unlike the span section above,
    // which suppresses compaction to isolate pure novelty deltas): the
    // compute curve is only meaningful under the bounded read fan-in the
    // default gives — with compaction suppressed, every batch's two
    // state scans union an ever-growing delta chain and the growth
    // measures the chain length, not the algorithm
    val eq = DedupGroupStream.attach(eStream, "doc_a", "doc_b",
      eState, eCkpt)
    awaitOrAbort(eq, "DedupGroupStream bench query")
    val eWall = (System.nanoTime() - t1) / 1e9
    // per-batch COMPUTE: with contract-then-relabel this tracks batch
    // size while the assignment grows — the companion curve to the
    // write-volume table below (the round-9 design re-ran CC over the
    // full star-contracted assignment every batch, so its per-batch
    // wall grew with corpus lifetime)
    batchDurations(eq).foreach { case (id, ms) =>
      println(s"""{"op":"dedup_group_stream_compute","batch":$id,"trigger_ms":$ms}""")
    }
    val evs = VersionedState.versions(spark, eState).sortBy(_.id)
    evs.foreach { v =>
      val rows = spark.read.parquet(v.path.toString).count()
      // what a full rewrite would write at this batch: the assignment
      // size = distinct doc_ids across the chain up to and including v
      val full = VersionedState
        .readKeyed(spark, eState, "doc_id", Some(v.id + 1)).get.count()
      val kind = if (v.compact) "compact" else "delta"
      println(s"""{"op":"dedup_group_stream_state","batch":${v.id},""" +
        s""""kind":"$kind","rows_written":$rows,"full_rewrite_rows":$full}""")
    }
    println(s"""{"op":"dedup_group_stream","batches":$batches,""" +
      s""""edges_per_batch":$edgesPerBatch,"wall_sec":${f"$eWall%.2f"}}""")
    spark.stop()
  }
}
