package graft.streaming

import org.apache.hadoop.fs.Path
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
  * State is a versioned parquet table under `stateDir` (one `v<batchId>`
  * directory per completed batch; the latest complete version is
  * re-resolved by listing, so a batch replayed after a crash overwrites
  * its own version idempotently — pair sets are union semantics, and
  * re-merging already-merged edges is a no-op).
  */
object DedupGroupStream {

  private val pairSchema = StructType(Seq(
    StructField("doc_a", LongType), StructField("doc_b", LongType)))

  /** Latest complete state version under `stateDir`, if any. */
  def latestState(spark: org.apache.spark.sql.SparkSession,
                  stateDir: String): Option[DataFrame] = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val versions = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .flatMap(s => s.getPath.getName.drop(1).toLongOption.map(_ -> s.getPath))
      .filter { case (_, path) => fs.exists(new Path(path, "_SUCCESS")) }
    versions.sortBy(-_._1).headOption.map { case (_, path) =>
      spark.read.parquet(path.toString)
    }
  }

  /** Attach the incremental-components sink to a stream of (aCol, bCol)
    * pair rows and start it. Each micro-batch refreshes
    * `stateDir/v<batchId>` with the full current (doc_id, group_id)
    * assignment, then prunes versions older than the newest
    * `retainVersions` (keeping a few for readers mid-scan of the previous
    * version and for post-mortem diffing — without pruning the state dir
    * grows by one full assignment copy per micro-batch forever). */
  def attach(pairStream: DataFrame, aCol: String, bCol: String,
             stateDir: String, checkpointDir: String,
             trigger: Trigger = Trigger.AvailableNow(),
             retainVersions: Int = 2): StreamingQuery =
    pairStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fresh = batch.select(
          col(aCol).cast("long").as("doc_a"), col(bCol).cast("long").as("doc_b"))
        val stars = latestState(spark, stateDir) match {
          case Some(st) => st.select(col("doc_id").as("doc_a"), col("group_id").as("doc_b"))
          case None => spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pairSchema)
        }
        val merged = TextDedup.duplicateGroups(
          stars.union(fresh), "doc_a", "doc_b")
        merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
        val root = new Path(stateDir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(root).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
          .flatMap(s => s.getPath.getName.drop(1).toLongOption.map(_ -> s.getPath))
          .sortBy(-_._1)
          .drop(math.max(1, retainVersions))
          .foreach { case (_, p) => fs.delete(p, true) }
      }
      .start()
}
