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
