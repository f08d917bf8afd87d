package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One registry mutation on the stream (the [[graft.sources.UserRegistry]]
  * log schema, typed). */
final case class RegMut(u_plate: String, username: Option[String],
                        email: Option[String], handicapped: Option[Boolean],
                        op: String, mut_seq: Long, expires_at: Option[Long])

/** One live registry row, emitted every micro-batch a plate's winning
  * mutation changes. `visible` folds in tombstone/expiry AS OF emit time;
  * `expires_at` rides along because expiry is a READ-side contract, the
  * Redis model exactly: a key's TTL lapsing does not push a notification
  * — readers just stop seeing it. A consumer materializing this stream
  * upserts visible rows, removes invisible ones, and must itself drop a
  * held row once `expires_at` passes (no further stream event will fire
  * for a plate that never mutates again). */
final case class RegUpdate(u_plate: String, visible: Boolean,
                           username: Option[String], email: Option[String],
                           handicapped: Option[Boolean], version: Long,
                           expires_at: Option[Long])

/** Streaming twin of the batch CDC registry view
  * ([[graft.sources.UserRegistry.view]]) — the same shape as
  * [[LiveSlotView]] (A12): `mapGroupsWithState` keyed by plate, state =
  * ONE winning mutation per plate (O(plates) at any stream length),
  * newest-by-mut_seq selection so ordering within and across
  * micro-batches is irrelevant. Seed the base table as mut_seq = −1
  * upserts at the head of the stream (or union it statically) — the
  * batch view does exactly that, so the converged stream state equals
  * the batch merge row-for-row (StreamingParitySpec). */
object RegistryStream {
  def updates(muts: DataFrame, clock: () => Long): Dataset[RegUpdate] = {
    val spark = muts.sparkSession
    import spark.implicits._
    muts
      .select("u_plate", "username", "email", "handicapped", "op", "mut_seq", "expires_at")
      .as[RegMut]
      .groupByKey(_.u_plate)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (plate: String, ms: Iterator[RegMut], state: GroupState[RegMut]) =>
          val batchLast = ms.maxBy(_.mut_seq)
          val cur = state.getOption match {
            case Some(s) if s.mut_seq > batchLast.mut_seq => s
            case _ => batchLast
          }
          state.update(cur)
          val now = clock()
          val visible = cur.op == "upsert" && cur.expires_at.forall(_ > now)
          RegUpdate(plate, visible, cur.username, cur.email,
            cur.handicapped, cur.mut_seq, cur.expires_at)
      }
  }
}
