package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.text.TextDedup

/** Streaming twin of [[graft.text.TextDedup.duplicateGroups]]: incremental
  * connected components over a STREAM of near-dup pairs (the output shape
  * of every pair miner in this engine), maintaining a (doc_id, group_id)
  * assignment table that converges to exactly what the batch operator
  * computes over all pairs seen so far.
  *
  * Algorithm — star contraction per micro-batch: the current assignment
  * re-enters the component computation as (member → group_id) edges. Those
  * star edges keep every previously-found component connected through its
  * min-id hub, so running the batch `duplicateGroups` over
  * `star edges ∪ new pairs` yields the components of the FULL pair history
  * while the input is only O(|assignment| + |batch|) edges — prior
  * components are contracted to depth-1 stars, never re-mined and never
  * re-expanded. Labels stay correct across merges because a group_id is
  * itself a member node id: when new pairs glue two old components
  * together, the min over the merged star is the true min over all their
  * members.
  *
  * This is a `foreachBatch` operator, not a keyed state store: component
  * merges span arbitrary keys (one pair can fuse groups living on any two
  * executors), which no per-key `flatMapGroupsWithState` partitioning can
  * express — while the assignment table itself can be arbitrarily large,
  * so it belongs in a distributed table, not in a collected driver map.
  * State lives in a [[VersionedState]] table under `stateDir`: each batch
  * appends a DELTA holding only the labels it added or changed, so
  * per-batch state writes are O(batch novelty) — a batch that glues two
  * old components rewrites the relabeled members, never the whole
  * assignment — with a full compact folded in every `compactEvery`
  * batches to bound the read fan-in. Reads are restricted BELOW the
  * current batch id: a replayed batch must diff against its
  * PREDECESSOR's assignment (diffing against its own failed delta would
  * compute an empty delta and lose the batch's relabels when it
  * overwrites), and the overwrite of its own directory is then
  * idempotent.
  */
object DedupGroupStream {

  private val pairSchema = StructType(Seq(
    StructField("doc_a", LongType), StructField("doc_b", LongType)))
  private val assignSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("group_id", LongType)))

  /** The current complete (doc_id, group_id) assignment under
    * `stateDir`, if any — newest write per doc_id wins across the
    * compact-plus-deltas chain. */
  def latestState(spark: org.apache.spark.sql.SparkSession,
                  stateDir: String): Option[DataFrame] =
    VersionedState.readKeyed(spark, stateDir, "doc_id")

  /** Attach the incremental-components sink to a stream of (aCol, bCol)
    * pair rows and start it. */
  def attach(pairStream: DataFrame, aCol: String, bCol: String,
             stateDir: String, checkpointDir: String,
             trigger: Trigger = Trigger.AvailableNow(),
             compactEvery: Int = 8): StreamingQuery =
    pairStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fresh = batch.select(
          col(aCol).cast("long").as("doc_a"), col(bCol).cast("long").as("doc_b"))
        // persisted for the batch scope: the star edges AND the changed-row
        // diff both consume the reconstructed assignment, and the CC loop
        // inside duplicateGroups may evaluate its input more than once
        val prev = VersionedState.readKeyed(spark, stateDir, "doc_id", Some(batchId))
          .getOrElse(spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], assignSchema))
          .persist()
        try {
          val stars = prev.select(
            col("doc_id").as("doc_a"), col("group_id").as("doc_b"))
          val merged = TextDedup.duplicateGroups(
            stars.union(fresh), "doc_a", "doc_b")
          if (VersionedState.shouldCompact(spark, stateDir, batchId, compactEvery))
            VersionedState.write(merged, stateDir, batchId, compact = true)
          else {
            val changed = merged
              .join(prev.withColumnRenamed("group_id", "__old"), Seq("doc_id"), "left")
              .filter(col("__old").isNull || col("__old") =!= col("group_id"))
              .select("doc_id", "group_id")
            VersionedState.write(changed, stateDir, batchId, compact = false)
          }
        } finally prev.unpersist(false)
        VersionedState.prune(spark, stateDir, batchId)
      }
      .start()
}
