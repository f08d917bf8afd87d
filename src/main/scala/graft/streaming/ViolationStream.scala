package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.ParkingAnalytics

/** §3.2 (reference srvc-alert ParkingEventConsumer.scala:24-53 +
  * AlertEventPublisher): real-time violation alerting as a stream-static
  * enrichment join — the streaming twin of the batch p11 query, sharing the
  * rule expression verbatim via [[ParkingAnalytics.violationsFrom]].
  *
  * Where the reference paid one blocking Redis round-trip per event, the
  * user dimension here is a static DataFrame joined per micro-batch
  * (Catalyst broadcasts it when small); at cluster scale the dimension can
  * be re-read each batch inside `foreachBatch` for freshness, exactly as a
  * slowly-changing registry warrants. Stateless append — no watermark or
  * state store involved.
  */
object ViolationStream {
  /** decoded event stream (EventDecode.decode) × user dim → alert rows
    * (event_id, vehicle_plate, spot_id, lot_id, violation_type, severity,
    * event_time). */
  def alerts(decoded: DataFrame, users: DataFrame): DataFrame =
    ParkingAnalytics.violationsFrom(decoded, users)
}
