package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{DedupGroupStream, SpanDedupStream, VersionedState}

/** Long-haul soak for the versioned-state streaming twins — the round-9
  * bench exercised 12 micro-batches (one compaction cycle); this runs
  * 100+ (a dozen-plus compaction + prune cycles) with a forced
  * mid-stream REPLAY, and HARD-asserts the properties that keep a
  * long-lived stream healthy:
  *
  *   1. state-dir growth is bounded: surviving version directories stay
  *      within ~2 compaction windows regardless of stream lifetime
  *      (prune really fires, forever);
  *   2. read fan-in is bounded: the version chain a state read resolves
  *      never exceeds compactEvery deltas + 1 compact;
  *   3. per-batch wall stays FLAT: the median over late full compaction
  *      cycles is within 2× of early cycles, while the state has grown
  *      ~10× — per-batch compute tracks batch size, not corpus history;
  *   4. a replayed batch (checkpoint commit deleted after the state
  *      write landed — the crash window) converges to the exact batch
  *      answer: stream state ≡ the batch operator over ALL data.
  *
  * Violations throw (non-zero exit): this main is an executable
  * assertion, not just a measurement. Run:
  * `sbt "runMain graft.StreamSoak [batches] [edgesPerBatch] [docsPerBatch]"`;
  * JSON lines + PASS lines land in bench_records/.
  */
object StreamSoak {

  private def awaitOrAbort(q: org.apache.spark.sql.streaming.StreamingQuery,
                           what: String, timeoutMs: Long = 3600000L): Unit = {
    val finished = q.awaitTermination(timeoutMs)
    if (!finished || q.isActive) {
      q.stop()
      sys.error(s"$what did not terminate within ${timeoutMs / 1000}s")
    }
  }

  private def batchDurations(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Seq[(Long, Long)] =
    q.recentProgress.toSeq
      .map(p => p.batchId ->
        p.durationMs.getOrDefault("triggerExecution", -1L).longValue())
      .filter(_._1 >= 0).sortBy(_._1)

  /** Median per-batch ms over `ids` (inclusive range). */
  private def medianOver(durs: Seq[(Long, Long)], lo: Long, hi: Long): Double = {
    val in = durs.collect { case (id, ms) if id >= lo && id <= hi => ms }.sorted
    require(in.nonEmpty, s"no batches in [$lo,$hi]")
    if (in.length % 2 == 1) in(in.length / 2).toDouble
    else (in(in.length / 2 - 1) + in(in.length / 2)) / 2.0
  }

  /** Delete the newest checkpoint commit — the crash window where state
    * landed but the commit did not; the restarted query must replay that
    * batch idempotently. Returns the replayed batch id. */
  private def dropNewestCommit(ckpt: String): Long = {
    val dir = new java.io.File(s"$ckpt/commits")
    val ids = dir.listFiles().filter(_.isFile)
      .flatMap(f => f.getName.toLongOption).sorted
    require(ids.nonEmpty, s"no commits under $ckpt")
    val last = ids.last
    require(new java.io.File(dir, last.toString).delete(),
      s"could not delete commit $last")
    // the local checksum FS shadows every file with .<name>.crc; leaving
    // it behind makes the replayed commit's rename fail as a concurrent-
    // writer conflict
    new java.io.File(dir, s".$last.crc").delete()
    last
  }

  /** Write `df` as one id-ordered json chunk per future micro-batch. */
  private def chunkToFiles(rows: Seq[String], perBatch: Int,
                           dir: java.nio.file.Path, prefix: String): Int = {
    var i = 0
    rows.grouped(perBatch).foreach { ls =>
      val f = dir.resolve(f"$prefix-$i%05d.json")
      Files.write(f, String.join("\n", ls: _*).getBytes("UTF-8"))
      f.toFile.setLastModified(1700000000000L + i * 60000L)
      i += 1
    }
    i
  }

  private def stateDirNames(stateDir: String): Seq[String] =
    new java.io.File(stateDir).listFiles().toSeq
      .filter(_.isDirectory).map(_.getName).sorted

  /** Bound checks shared by both twins. */
  private def checkStateBounds(spark: org.apache.spark.sql.SparkSession,
                               stateDir: String, compactEvery: Int,
                               twin: String): Unit = {
    val vs = VersionedState.versions(spark, stateDir)
    val dirs = stateDirNames(stateDir)
    // ~2 compaction windows survive prune (newest + one grace), plus the
    // in-flight chain above the newest compact
    val dirBound = 3 * (compactEvery + 1)
    assert(dirs.length <= dirBound,
      s"$twin: ${dirs.length} state dirs exceed bound $dirBound: $dirs")
    // read fan-in for the CURRENT state: newest compact + deltas above it
    val newestCompact = vs.find(_.compact)
      .getOrElse(sys.error(s"$twin: no compact survived")).id
    val fanIn = 1 + vs.count(v => !v.compact && v.id > newestCompact)
    assert(fanIn <= compactEvery + 1,
      s"$twin: read fan-in $fanIn exceeds ${compactEvery + 1}")
    val files = dirs.map(d =>
      new java.io.File(s"$stateDir/$d").listFiles().count(_.isFile)).sum
    println(s"""{"op":"${twin}_soak_state","dirs":${dirs.length},""" +
      s""""files":$files,"read_fan_in":$fanIn}""")
    println(s"PASS $twin state bounds: dirs=${dirs.length} <= $dirBound, " +
      s"fan-in=$fanIn <= ${compactEvery + 1}")
  }

  /** Flat-wall check: median per-batch ms over late cycles vs early
    * cycles (windows aligned to full compaction cycles so each sees the
    * same chain-length mix). */
  private def checkFlatWall(durs: Seq[(Long, Long)], compactEvery: Int,
                            batches: Int, twin: String): Unit = {
    val cycle = compactEvery + 1
    val earlyLo = cycle.toLong; val earlyHi = earlyLo + 3L * cycle - 1
    val lateHi = batches.toLong - 2; val lateLo = lateHi - 3L * cycle + 1
    val early = medianOver(durs, earlyLo, earlyHi)
    val late = medianOver(durs, lateLo, lateHi)
    println(s"""{"op":"${twin}_soak_wall","early_median_ms":$early,""" +
      s""""late_median_ms":$late,"early":[$earlyLo,$earlyHi],"late":[$lateLo,$lateHi]}""")
    assert(late <= 2.0 * early + 250,
      s"$twin: late median ${late}ms not flat vs early ${early}ms")
    println(f"PASS $twin flat wall: early=$early%.0fms late=$late%.0fms")
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(120)
    val edgesPerBatch = args.lift(1).map(_.toInt).getOrElse(5000)
    val docsPerBatch = args.lift(2).map(_.toInt).getOrElse(300)
    val compactEvery = 8
    val spark = DevBench.session()
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
      (batches + 16).toString)
    import spark.implicits._

    // ===== DedupGroupStream: 120 batches of near-dup pair edges =====
    val allEdges = ScaleCorpusBench
      .synthEdges(spark, batches.toLong * edgesPerBatch).persist()
    val eDir = Files.createTempDirectory("graft-soak-edges")
    val eLines = allEdges.orderBy("doc_a", "doc_b")
      .select(to_json(struct(col("doc_a"), col("doc_b"))).as("l"))
      .collect().map(_.getString(0)).toSeq
    chunkToFiles(eLines, edgesPerBatch, eDir, "edges")
    val eSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("doc_b",
        org.apache.spark.sql.types.LongType)))
    def edgeStream = spark.readStream.schema(eSchema)
      .option("maxFilesPerTrigger", 1).json(eDir.toString)
    val eState = Files.createTempDirectory("graft-soak-estate").toString
    val eCkpt = Files.createTempDirectory("graft-soak-eckpt").toString

    val t0 = System.nanoTime()
    val eq = DedupGroupStream.attach(edgeStream, "doc_a", "doc_b",
      eState, eCkpt, compactEvery = compactEvery)
    awaitOrAbort(eq, "dedup-group soak")
    val eWall = (System.nanoTime() - t0) / 1e9
    val eDurs = batchDurations(eq)
    eDurs.foreach { case (id, ms) =>
      println(s"""{"op":"dedup_group_soak_compute","batch":$id,"trigger_ms":$ms}""")
    }
    println(f"""{"op":"dedup_group_soak","batches":$batches,"edges_per_batch":$edgesPerBatch,"wall_sec":$eWall%.1f}""")
    checkFlatWall(eDurs, compactEvery, batches, "dedup_group")
    checkStateBounds(spark, eState, compactEvery, "dedup_group")

    // mid-stream replay: drop the newest commit (state landed, commit
    // lost) and restart — the replayed batch must be idempotent
    val replayed = dropNewestCommit(eCkpt)
    val eq2 = DedupGroupStream.attach(edgeStream, "doc_a", "doc_b",
      eState, eCkpt, compactEvery = compactEvery)
    awaitOrAbort(eq2, "dedup-group replay")
    println(s"""{"op":"dedup_group_soak_replay","batch":$replayed}""")

    // convergence: stream state ≡ batch CC over every edge streamed
    val got = DedupGroupStream.latestState(spark, eState).get
    val want = graft.text.TextDedup.duplicateGroups(allEdges, "doc_a", "doc_b")
    val missing = want.exceptAll(got).count()
    val extra = got.exceptAll(want).count()
    assert(missing == 0 && extra == 0,
      s"dedup_group: stream/batch divergence missing=$missing extra=$extra")
    println(s"PASS dedup_group replay + parity: ${got.count()} assignments " +
      s"== batch CC, replayed batch $replayed idempotent")
    allEdges.unpersist(false)

    // ===== SpanDedupStream: same soak over a document stream =====
    val corpus = ScaleCorpusBench
      .synthCorpus(spark, batches.toLong * docsPerBatch).persist()
    val dDir = Files.createTempDirectory("graft-soak-docs")
    val dLines = corpus.orderBy("doc_id")
      .select(to_json(struct(col("doc_id"), col("text"))).as("l"))
      .collect().map(_.getString(0)).toSeq
    chunkToFiles(dLines, docsPerBatch, dDir, "docs")
    val dSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def docStream = spark.readStream.schema(dSchema)
      .option("maxFilesPerTrigger", 1).json(dDir.toString)
    val outDir = Files.createTempDirectory("graft-soak-out").toString
    val sState = Files.createTempDirectory("graft-soak-sstate").toString
    val sCkpt = Files.createTempDirectory("graft-soak-sckpt").toString

    val t1 = System.nanoTime()
    val sq = SpanDedupStream.attach(docStream, "doc_id", "text", outDir,
      sState, sCkpt, compactEvery = compactEvery)
    awaitOrAbort(sq, "span-dedup soak")
    val sWall = (System.nanoTime() - t1) / 1e9
    val sDurs = batchDurations(sq)
    sDurs.foreach { case (id, ms) =>
      println(s"""{"op":"span_dedup_soak_compute","batch":$id,"trigger_ms":$ms}""")
    }
    println(f"""{"op":"span_dedup_soak","batches":$batches,"docs_per_batch":$docsPerBatch,"wall_sec":$sWall%.1f}""")
    checkFlatWall(sDurs, compactEvery, batches, "span_dedup")
    checkStateBounds(spark, sState, compactEvery, "span_dedup")

    val sReplayed = dropNewestCommit(sCkpt)
    val sq2 = SpanDedupStream.attach(docStream, "doc_id", "text", outDir,
      sState, sCkpt, compactEvery = compactEvery)
    awaitOrAbort(sq2, "span-dedup replay")
    println(s"""{"op":"span_dedup_soak_replay","batch":$sReplayed}""")

    // convergence: cumulative stream output ≡ batch spanDedup over the
    // whole corpus (row-identical cleaned text per doc)
    val streamed = spark.read.parquet(outDir).drop("batch")
    val batchOut = graft.text.TextDedup.spanDedup(corpus, "doc_id", "text")
    val sMissing = batchOut.exceptAll(streamed).count()
    val sExtra = streamed.exceptAll(batchOut).count()
    assert(sMissing == 0 && sExtra == 0,
      s"span_dedup: stream/batch divergence missing=$sMissing extra=$sExtra")
    println(s"PASS span_dedup replay + parity: ${streamed.count()} docs " +
      s"== batch spanDedup, replayed batch $sReplayed idempotent")
    corpus.unpersist(false)

    spark.stop()
    println("SOAK COMPLETE: all bounds held")
  }
}
