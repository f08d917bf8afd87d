package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One slot event as the aggregate's input row. */
final case class SlotEvt(spot: String, isEntry: Boolean, eventId: Long)

/** A5 as a SQL-callable typed aggregate — the one custom aggregate
  * SURVEY §2.9 earmarked (`occupancy_at` style): count of occupied slots
  * in a group of slot events, where the latest event (by eventId) per spot
  * decides occupancy.
  *
  * Buffer = spot → (latest eventId, isEntry); reduce and merge both take
  * the per-spot maximum, which is associative and commutative — so Spark
  * runs partial aggregation map-side exactly like a built-in, and the
  * buffer is bounded by the slot universe, not the event count. The
  * equivalent composed-operator plan (`max_by` + conditional count, used
  * by the p09/p10 queries) needs two aggregations; this packs it into one
  * SQL-callable function: `df.groupBy("lot").agg(occupied_slots(...))`.
  */
object OccupancyAgg extends Aggregator[SlotEvt, Map[String, (Long, Boolean)], Long] {
  override def zero: Map[String, (Long, Boolean)] = Map.empty

  override def reduce(b: Map[String, (Long, Boolean)], e: SlotEvt): Map[String, (Long, Boolean)] =
    b.get(e.spot) match {
      case Some((id, _)) if id > e.eventId => b
      case _ => b.updated(e.spot, (e.eventId, e.isEntry))
    }

  override def merge(b1: Map[String, (Long, Boolean)],
                     b2: Map[String, (Long, Boolean)]): Map[String, (Long, Boolean)] =
    (b1.keySet ++ b2.keySet).iterator.map { spot =>
      val v = (b1.get(spot), b2.get(spot)) match {
        case (Some(a), Some(b)) => if (a._1 >= b._1) a else b
        case (Some(a), None) => a
        case (None, Some(b)) => b
        case _ => throw new IllegalStateException("unreachable")
      }
      spot -> v
    }.toMap

  override def finish(b: Map[String, (Long, Boolean)]): Long = b.values.count(_._2).toLong

  override def bufferEncoder: Encoder[Map[String, (Long, Boolean)]] =
    Encoders.kryo[Map[String, (Long, Boolean)]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
