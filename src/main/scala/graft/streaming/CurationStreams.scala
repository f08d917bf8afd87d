package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextPrims.tokens
import graft.text.TextCuration

/** Streaming twin of the p81 context-window chunking
  * ([[graft.text.TextCuration.tokenChunks]]). Chunking is row-local —
  * one posexplode per document, no state, no shuffle — so the batch
  * transform IS its own streaming twin: this object delegates to the
  * exact batch code path (minus the batch-only presentation sort), and
  * the parity case proves Spark accepts the plan on an unbounded source
  * and that rows match batch exactly across micro-batches. At 100 TB/day
  * of streaming ingest, chunking stays a scan-side projection whose
  * parallelism is the source's partition count. */
object ChunkStream {
  def chunks(docs: DataFrame, idCol: String, textCol: String,
             chunkTokens: Int = 32, overlap: Int = 8): DataFrame =
    TextCuration.tokenChunksUnordered(docs, idCol, textCol, chunkTokens, overlap)
}

/** One document entering the streaming packer: shard, id, token count. */
final case class PackDoc(shard: Long, id: Long, n_tokens: Long)

/** Per-shard packer state: the running cumulative token count. */
final case class PackOffset(cum: Long)

/** One packed document: its position in the shard's token stream and the
  * fixed-budget bin it starts in. */
final case class PackedDoc(shard: Long, id: Long, n_tokens: Long,
                           cum_tokens: Long, bin: Long)

/** Streaming twin of the p82 sequence packing
  * ([[graft.text.TextCuration.sequencePacking]]): documents are packed
  * back-to-back into fixed-token-budget bins by cumulative token count,
  * per SHARD, with the running offset carried across micro-batches in
  * `flatMapGroupsWithState` — state is ONE long per shard, so the state
  * store is O(shards) at any stream length.
  *
  * Sharding is the semantic, not a shortcut: a global sequential pack
  * order does not exist on an unbounded stream (it would serialize the
  * pipeline through one packer and its bins would keep shifting as data
  * arrives), and real training-data writers pack per output shard
  * anyway. Within a shard the semantics are EXACTLY the batch
  * operator's: the parity case proves per-shard stream output ≡ batch
  * [[TextCuration.sequencePacking]] run on that shard's documents, with
  * (cum_tokens, bin) identical row-for-row.
  *
  * Contract for batch parity (same as [[AsOfStream]]): per shard,
  * documents arrive id-ordered ACROSS micro-batches (any order within
  * one) — the natural shape of a replay from an id-ordered lake or a
  * per-shard-ordered Kafka topic. Token counts use the same `tokens`
  * expression as the batch op, so the two cannot drift. */
object PackingStream {
  def packed(docs: DataFrame, shardCol: String, idCol: String, textCol: String,
             budgetTokens: Long = 512L): Dataset[PackedDoc] = {
    require(budgetTokens > 0, "budgetTokens must be > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(shardCol).cast("long").as("shard"),
        col(idCol).cast("long").as("id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .as[PackDoc]
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, evs: Iterator[PackDoc], state: GroupState[PackOffset]) =>
          val sorted = evs.toIndexedSeq.sortBy(_.id)
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = sorted.map { d =>
            cum += d.n_tokens
            PackedDoc(shard, d.id, d.n_tokens, cum,
              Math.floorDiv(cum - d.n_tokens, budgetTokens))
          }
          state.update(PackOffset(cum))
          out.iterator
      }
  }
}

/** Streaming twin of the p88 bigram novelty scorer
  * ([[graft.text.TextStats.bigramScore]]): score a document STREAM
  * against a FROZEN model table — the split a production pipeline
  * actually runs (train once offline on a reference corpus, score the
  * ingest stream forever). Scoring is per-document given the model, so
  * each micro-batch runs the exact batch scorer via `foreachBatch` and
  * appends its rows; parity with the batch operator is row-exact by
  * construction and pinned by the replay test. The model is a plain
  * distributed table — at 100 TB it joins by shuffle or broadcast just
  * like the batch path, never a driver-side map. */
object NoveltyScoreStream {
  def attach(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
             model: org.apache.spark.sql.DataFrame, outDir: String,
             checkpointDir: String,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // one OVERWRITTEN partition per batch id: a replayed batch (failure
        // between the write and the checkpoint commit) rewrites its own
        // partition instead of appending duplicates — foreachBatch's
        // exactly-once contract. Readers discover `batch` as a partition
        // column and drop it.
        graft.text.TextStats.bigramScore(batch, idCol, textCol, model)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()
}

/** Streaming twin of the p87 span-level dedup
  * ([[graft.text.TextDedup.spanDedup]]): incremental repeated-window
  * removal over a document stream. State is the set of window keys seen
  * so far, kept as a [[VersionedState]] parquet table (a distributed
  * table, not a per-key state store: the cleanup step needs the batch's
  * removal starts JOINED back to the batch's documents, which is a
  * per-batch join, not a keyed emission). Per batch: an occurrence is
  * removed iff its key was seen in an earlier batch OR it is not the
  * batch's minimum-(id, pos) occurrence of that key — so the kept copy
  * is always the FIRST-SEEN occurrence.
  *
  * Batch parity (pinned by the replay test): when documents arrive
  * id-ordered ACROSS micro-batches (any order within one — the
  * [[PackingStream]]/AsOfStream contract), first-seen ≡ global
  * minimum-(id, pos), so the cumulative stream output is row-identical
  * to batch `spanDedup` over all documents seen, with minCount = 2: a
  * removal happens exactly when a second occurrence exists. Each batch
  * appends only its NOVEL keys as a `stateDir/d<batchId>` delta — state
  * writes track batch novelty, not corpus history, so a long-running
  * stream's per-batch cost stays proportional to its ingest — with a
  * full compact folded in every `compactEvery` batches and superseded
  * windows pruned (see [[VersionedState]] for the replay contract). */
object SpanDedupStream {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
  import org.apache.spark.sql.types.{LongType, StructField, StructType}
  import graft.text.TextDedup

  private val seenSchema = StructType(Seq(StructField("wh", LongType)))

  /** The complete seen-key set under `stateDir` (union of the newest
    * compact and the deltas above it), restricted to versions BELOW
    * `beforeBatch` when given: a replayed batch (failure after the state
    * write, before the checkpoint commit) must read its PREDECESSOR's
    * state, not the delta its own failed attempt wrote — including its
    * own delta would mark the whole batch as already-seen and scrub
    * every span, then record an EMPTY novelty delta over the real one. */
  def latestState(spark: org.apache.spark.sql.SparkSession,
                  stateDir: String,
                  beforeBatch: Option[Long] = None): Option[DataFrame] =
    VersionedState.readSet(spark, stateDir, beforeBatch)

  def attach(docs: DataFrame, idCol: String, textCol: String,
             outDir: String, stateDir: String, checkpointDir: String,
             spanK: Int = 8,
             trigger: Trigger = Trigger.AvailableNow(),
             compactEvery: Int = 8): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val tok = TextDedup.spanTokenFrame(batch, idCol, textCol)
        // persisted for the batch scope: the cleaned-output write AND the
        // state write both consume the occurrence rows — without the
        // persist the second action re-runs the whole tokenize/hash/
        // explode fold (the recompute the batch operator's shared
        // exchange exists to avoid)
        val occ = TextDedup.spanOccurrences(tok, spanK)
          .repartition(col("wh")).persist()
        try {
          val seen = latestState(spark, stateDir, Some(batchId)).getOrElse(
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], seenSchema))
          // batch keeper per key; an occurrence survives only as the first
          // occurrence of a never-before-seen key
          val grp = occ.groupBy("wh")
            .agg(min(struct(col("id"), col("pos"))).as("keep"))
          val starts = occ.join(grp, Seq("wh"))
            .join(seen.select(col("wh"), lit(true).as("__seen")), Seq("wh"), "left")
            .filter(col("__seen").isNotNull ||
              col("id") =!= col("keep.id") || col("pos") =!= col("keep.pos"))
            .groupBy("id").agg(sort_array(collect_list(col("pos"))).as("starts"))
          // one OVERWRITTEN partition per batch id — a replayed batch
          // rewrites its own partition instead of appending duplicates;
          // readers discover `batch` as a partition column and drop it
          TextDedup.spanCleanup(tok, starts, spanK)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          // state write: the batch's NOVEL keys only — deltas are disjoint
          // from everything before them by construction, so the reader's
          // union needs no dedup
          val novel = grp.select("wh").join(seen, Seq("wh"), "left_anti")
          if (VersionedState.shouldCompact(spark, stateDir, batchId, compactEvery))
            VersionedState.write(seen.union(novel), stateDir, batchId, compact = true)
          else
            VersionedState.write(novel, stateDir, batchId, compact = false)
        } finally occ.unpersist(false)
        VersionedState.prune(spark, stateDir, batchId)
      }
      .start()
}

/** Streaming twin of the p90 span-level decontamination scrub
  * ([[graft.text.TextDedup.spanScrub]]): scrub a document STREAM against
  * a FROZEN benchmark — stateless given the benchmark (no cross-batch
  * memory: contamination is membership in a fixed key set, not
  * first-seen), so each micro-batch runs the exact batch operator via
  * `foreachBatch`, writing one overwritten batch=<id> partition (replay
  * rewrites, never duplicates — readers drop the partition column).
  * Parity with batch spanScrub is row-exact by construction and pinned
  * by the replay test. */
object SpanScrubStream {
  def attach(docs: org.apache.spark.sql.DataFrame,
             benchmark: org.apache.spark.sql.DataFrame,
             idCol: String, textCol: String, outDir: String,
             checkpointDir: String, spanK: Int = 8,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        graft.text.TextDedup.spanScrub(batch, benchmark, idCol, textCol, spanK)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()
}
