package graft

/** DuckDB oracle SQL for every SQL-expressible query in [[SparkEntry.queries]].
  *
  * Determinism contract (so value-hash comparison is exact, not approximate):
  *  - integer columns: only counts / integer sums — exact in both engines;
  *  - doubles: either (a) an exact integer aggregate followed by the SAME
  *    left-to-right sequence of double ops (e.g. `CAST(SUM(d) AS DOUBLE) * 2.0
  *    / 60.0`), which is bit-identical under IEEE-754, or (b) double sums
  *    routed through DECIMAL(25,6) so summation order can't change the result;
  *  - timestamps: never emitted raw — always formatted to second granularity
  *    (strftime ↔ date_format), session TZ UTC on the Spark side;
  *  - window order: `event_id` (unique, ts-ordered) — no tie ambiguity;
  *  - every query has a total ORDER BY in both engines.
  */
object OracleSql {

  /** DuckDB mirror of [[graft.schema.ParkingModel.parkingEvents]] /
    * [[graft.schema.ParkingModel.users]]. Keep in lockstep with the Scala. */
  val ParkingCte: String =
    """WITH parking AS (
      |  SELECT
      |    event_id,
      |    ts,
      |    CASE WHEN event_type IN ('view','click','signup')
      |         THEN 'PARKING_ENTRY' ELSE 'PARKING_EXIT' END AS eventType,
      |    'P-' || CAST(user_id AS VARCHAR) AS licensePlate,
      |    'lot-0' || CAST(user_id % 3 + 1 AS VARCHAR) AS parkingLotId,
      |    CAST(user_id % 100 AS VARCHAR) AS parkingSpotId,
      |    event_id % 11 = 0 AS isSlotHandicapped,
      |    CASE user_id % 5 WHEN 0 THEN 'car' WHEN 1 THEN 'truck'
      |         WHEN 2 THEN 'motorcycle' WHEN 3 THEN 'van' ELSE 'suv' END AS vehicleType,
      |    CAST(FLOOR(value * 60000) AS BIGINT) AS duration_ms,
      |    user_id
      |  FROM events
      |), users AS (
      |  SELECT 'P-' || CAST(c_custkey AS VARCHAR) AS u_plate,
      |         c_custkey % 13 = 0 AS handicapped
      |  FROM customer WHERE c_custkey % 7 <> 0
      |)""".stripMargin

  private val pairedCte: String =
    ParkingCte + """,
      |seq AS (
      |  SELECT *, lag(eventType) OVER w AS prev_type, lag(ts) OVER w AS prev_ts
      |  FROM parking
      |  WINDOW w AS (PARTITION BY licensePlate, parkingSpotId ORDER BY event_id)
      |), paired AS (
      |  SELECT event_id AS exit_event_id, licensePlate, parkingSpotId,
      |         parkingLotId, vehicleType,
      |         strftime(prev_ts, '%Y-%m-%d %H:%M:%S') AS entry_ts,
      |         strftime(ts, '%Y-%m-%d %H:%M:%S') AS exit_ts,
      |         CAST(FLOOR((FLOOR(epoch(ts)) - FLOOR(epoch(prev_ts))) / 60) AS BIGINT) AS duration_min
      |  FROM seq
      |  WHERE eventType = 'PARKING_EXIT' AND prev_type = 'PARKING_ENTRY'
      |)""".stripMargin

  val parking: Map[String, String] = Map(
    "p01_hourly_stats" -> (ParkingCte + """,
      |per_lot AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS date_str, strftime(ts, '%H') AS hour_str,
      |         parkingLotId,
      |         COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS entries,
      |         COUNT(CASE WHEN eventType = 'PARKING_EXIT' THEN 1 END) AS exits
      |  FROM parking GROUP BY 1, 2, 3
      |)
      |SELECT date_str, hour_str,
      |       CAST(SUM(entries) AS BIGINT) AS nbr_entries,
      |       CAST(SUM(exits) AS BIGINT) AS nbr_exit,
      |       CAST(SUM(GREATEST(0, entries - exits)) AS DOUBLE) * 2.0 AS revenue_simulation
      |FROM per_lot GROUP BY date_str, hour_str ORDER BY date_str, hour_str""".stripMargin),

    "p02_occupancy_by_lot" -> (ParkingCte + """
      |SELECT strftime(ts, '%Y-%m-%d') AS date_str, strftime(ts, '%H') AS hour_str,
      |       parkingLotId,
      |       COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS entries,
      |       COUNT(CASE WHEN eventType = 'PARKING_EXIT' THEN 1 END) AS exits,
      |       GREATEST(0, COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END)
      |                    - COUNT(CASE WHEN eventType = 'PARKING_EXIT' THEN 1 END)) AS occupancy
      |FROM parking GROUP BY 1, 2, 3 ORDER BY date_str, hour_str, parkingLotId""".stripMargin),

    "p03_vehicle_types" -> (ParkingCte + """
      |SELECT vehicleType, COUNT(*) AS cnt FROM parking
      |GROUP BY vehicleType ORDER BY vehicleType""".stripMargin),

    "p04_daily_rollup" -> (ParkingCte + """
      |SELECT strftime(ts, '%Y-%m-%d') AS date_str,
      |       COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS entries,
      |       COUNT(CASE WHEN eventType = 'PARKING_EXIT' THEN 1 END) AS exits,
      |       COUNT(*) AS total_events
      |FROM parking GROUP BY 1 ORDER BY date_str""".stripMargin),

    "p05_session_pairing" -> (pairedCte + """
      |SELECT * FROM paired ORDER BY exit_event_id""".stripMargin),

    "p06_revenue_by_type" -> (pairedCte + """
      |SELECT vehicleType, COUNT(*) AS n_sessions,
      |       CAST(SUM(duration_min) AS DOUBLE) * 2.0 / 60.0 AS revenue
      |FROM paired GROUP BY vehicleType ORDER BY vehicleType""".stripMargin),

    "p07_avg_spent_by_type_day" -> (pairedCte + """
      |SELECT substr(exit_ts, 1, 10) AS date_str, vehicleType, COUNT(*) AS n_sessions,
      |       CAST(SUM(duration_min) AS DOUBLE) * 2.0 / 60.0 / COUNT(*) AS avg_spent
      |FROM paired GROUP BY 1, 2 ORDER BY date_str, vehicleType""".stripMargin),

    "p08_top_vehicles" -> (ParkingCte + """
      |SELECT licensePlate, COUNT(*) AS cnt FROM parking
      |GROUP BY licensePlate ORDER BY cnt DESC, licensePlate LIMIT 10""".stripMargin),

    "p09_latest_slot_state" -> (ParkingCte + """,
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY parkingLotId, parkingSpotId
      |                               ORDER BY event_id DESC) AS rn
      |  FROM parking
      |)
      |SELECT parkingLotId, parkingSpotId,
      |       eventType = 'PARKING_ENTRY' AS occupied,
      |       CASE WHEN eventType = 'PARKING_ENTRY' THEN licensePlate END AS plate
      |FROM ranked WHERE rn = 1 ORDER BY parkingLotId, parkingSpotId""".stripMargin),

    "p10_occupancy_replay" -> (ParkingCte + """,
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY parkingLotId, parkingSpotId
      |                               ORDER BY event_id DESC) AS rn
      |  -- µs-truncate before comparing: Spark normalizes ts to µs
      |  -- precision whatever the parquet encoding (native µs today;
      |  -- ns div 1000 under the legacy nanos layout), so an event inside
      |  -- (cutoff, cutoff+1µs) must be included on both sides; on µs data
      |  -- epoch_ns//1000 ≡ epoch_us exactly.
      |  FROM parking
      |  WHERE epoch_ns(ts) // 1000 <= epoch_us(TIMESTAMP '2024-01-15 00:00:00')
      |)
      |SELECT parkingLotId,
      |       COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS occupied_slots
      |FROM ranked WHERE rn = 1 GROUP BY parkingLotId ORDER BY parkingLotId""".stripMargin),

    "p11_violations" -> (ParkingCte + """
      |SELECT event_id, licensePlate AS vehicle_plate, parkingSpotId AS spot_id,
      |       parkingLotId AS lot_id,
      |       CASE WHEN handicapped IS NULL THEN 'unknown_user'
      |            ELSE 'unauthorized_user' END AS violation_type,
      |       CASE WHEN handicapped IS NULL THEN 'MEDIUM' ELSE 'HIGH' END AS severity,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time
      |FROM parking LEFT JOIN users ON licensePlate = u_plate
      |WHERE isSlotHandicapped AND (handicapped IS NULL OR NOT handicapped)
      |ORDER BY event_id""".stripMargin),

    "p12_cumulative_hourly" -> (ParkingCte + """,
      |hourly AS (
      |  SELECT parkingLotId, strftime(ts, '%Y-%m-%d %H') AS hour_bucket,
      |         COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS entries
      |  FROM parking GROUP BY 1, 2
      |)
      |SELECT parkingLotId, hour_bucket, CAST(entries AS BIGINT) AS entries,
      |       CAST(SUM(entries) OVER (PARTITION BY parkingLotId ORDER BY hour_bucket
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_entries
      |FROM hourly ORDER BY parkingLotId, hour_bucket""".stripMargin),

    "p24_hourly_doc_flat" -> (ParkingCte + """,
      |per_lot AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS date_str, strftime(ts, '%H') AS hour_str,
      |         parkingLotId,
      |         COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS entries,
      |         COUNT(CASE WHEN eventType = 'PARKING_EXIT' THEN 1 END) AS exits
      |  FROM parking GROUP BY 1, 2, 3
      |), lot_occ AS (SELECT *, GREATEST(0, entries - exits) AS occ FROM per_lot),
      |lot_agg AS (
      |  SELECT date_str, hour_str,
      |         CAST(SUM(entries) AS BIGINT) AS nbr_entries,
      |         CAST(SUM(exits) AS BIGINT) AS nbr_exit,
      |         CAST(SUM(occ) AS DOUBLE) * 2.0 AS revenue_simulation,
      |         string_agg(parkingLotId || '=' || CAST(occ AS VARCHAR), ','
      |                    ORDER BY parkingLotId) AS occupancy_by_lot
      |  FROM lot_occ GROUP BY 1, 2
      |), type_cnt AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS date_str, strftime(ts, '%H') AS hour_str,
      |         vehicleType, COUNT(*) AS c
      |  FROM parking GROUP BY 1, 2, 3
      |), type_agg AS (
      |  SELECT date_str, hour_str,
      |         string_agg(vehicleType || '=' || CAST(c AS VARCHAR), ','
      |                    ORDER BY vehicleType) AS vehicle_types
      |  FROM type_cnt GROUP BY 1, 2
      |)
      |SELECT l.date_str, l.hour_str, nbr_entries, nbr_exit, revenue_simulation,
      |       occupancy_by_lot, vehicle_types
      |FROM lot_agg l JOIN type_agg t ON l.date_str = t.date_str AND l.hour_str = t.hour_str
      |ORDER BY l.date_str, l.hour_str""".stripMargin),

    "p25_session_durations" -> (ParkingCte + """,
      |seq AS (
      |  SELECT *, lag(eventType) OVER w AS prev_type, lag(ts) OVER w AS prev_ts
      |  FROM parking
      |  WINDOW w AS (PARTITION BY licensePlate, parkingSpotId ORDER BY event_id)
      |)
      |SELECT event_id AS exit_event_id, licensePlate, parkingSpotId, parkingLotId,
      |       CAST(CASE WHEN prev_type = 'PARKING_ENTRY'
      |            THEN FLOOR((FLOOR(epoch(ts)) - FLOOR(epoch(prev_ts))) / 60)
      |            ELSE FLOOR(duration_ms / 60000) END AS BIGINT) AS duration_min,
      |       CASE WHEN prev_type = 'PARKING_ENTRY' THEN 'paired'
      |            ELSE 'fallback' END AS duration_source
      |FROM seq WHERE eventType = 'PARKING_EXIT' ORDER BY exit_event_id""".stripMargin),

    "p26_capacity_by_lot" -> (ParkingCte + """,
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY parkingLotId, parkingSpotId
      |                               ORDER BY event_id DESC) AS rn
      |  FROM parking
      |), occ AS (
      |  SELECT parkingLotId,
      |         COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS occupied_slots
      |  FROM ranked WHERE rn = 1 GROUP BY 1
      |)
      |SELECT parkingLotId,
      |       CAST(CASE parkingLotId WHEN 'lot-01' THEN 41 WHEN 'lot-02' THEN 101
      |            ELSE 150 END AS BIGINT) AS capacity,
      |       occupied_slots,
      |       CAST(CASE parkingLotId WHEN 'lot-01' THEN 41 WHEN 'lot-02' THEN 101
      |            ELSE 150 END AS BIGINT) - occupied_slots AS available
      |FROM occ ORDER BY parkingLotId""".stripMargin),

    "p27_latest_ts" -> (ParkingCte + """
      |SELECT strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts,
      |       COUNT(*) AS n_events FROM parking""".stripMargin),

    // strict as-of twin of AsOfJoin.asOf over the p28 series: for each
    // event, the max series bucket strictly before its own hour, left
    // joins preserved so first-hour events keep a null occupancy. The
    // O(E×S) inequality join is fine for the oracle at sf0.01; the Spark
    // side is the single-shuffle union-window plan.
    "p44_asof_occupancy" -> (ParkingCte + """,
      |hourly AS (
      |  SELECT parkingLotId, strftime(ts, '%Y-%m-%d %H') AS hour_bucket,
      |         COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS entries,
      |         COUNT(CASE WHEN eventType = 'PARKING_EXIT' THEN 1 END) AS exits
      |  FROM parking GROUP BY 1, 2
      |), series AS (
      |  SELECT parkingLotId, hour_bucket,
      |         GREATEST(0, CAST(SUM(entries) OVER w AS BIGINT)
      |                     - CAST(SUM(exits) OVER w AS BIGINT)) AS occ
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY parkingLotId ORDER BY hour_bucket
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), ev AS (
      |  SELECT event_id, parkingLotId, strftime(ts, '%Y-%m-%d %H') AS hb
      |  FROM parking
      |), best AS (
      |  SELECT e.event_id, e.parkingLotId, e.hb, max(s.hour_bucket) AS bh
      |  FROM ev e LEFT JOIN series s
      |    ON s.parkingLotId = e.parkingLotId AND s.hour_bucket < e.hb
      |  GROUP BY 1, 2, 3
      |)
      |SELECT b.event_id, b.parkingLotId, b.hb AS hour_bucket_ev,
      |       s.occ AS occ_prev_hour
      |FROM best b LEFT JOIN series s
      |  ON s.parkingLotId = b.parkingLotId AND s.hour_bucket = b.bh
      |ORDER BY event_id""".stripMargin),

    // point-in-interval twin of RangeJoin.pointInInterval: the oracle
    // states containment as a plain inequality join (fine at sf0.01);
    // the Spark side is the day-binned equi-join plan.
    "p45_event_session_range" -> (ParkingCte + """,
      |seq AS (
      |  SELECT *, lag(eventType) OVER w AS prev_type, lag(ts) OVER w AS prev_ts
      |  FROM parking
      |  WINDOW w AS (PARTITION BY licensePlate, parkingSpotId ORDER BY event_id)
      |), sess AS (
      |  SELECT event_id AS sess_id, parkingLotId, parkingSpotId,
      |         CAST(FLOOR(epoch(prev_ts)) AS BIGINT) AS entry_sec,
      |         CAST(FLOOR(epoch(ts)) AS BIGINT) AS exit_sec
      |  FROM seq WHERE eventType = 'PARKING_EXIT' AND prev_type = 'PARKING_ENTRY'
      |), ev AS (
      |  SELECT event_id, parkingLotId, parkingSpotId,
      |         CAST(FLOOR(epoch(ts)) AS BIGINT) AS ev_sec
      |  FROM parking
      |)
      |SELECT e.event_id, e.parkingLotId, e.parkingSpotId,
      |       count(*) AS n_sessions, min(s.sess_id) AS first_session
      |FROM ev e JOIN sess s
      |  ON s.parkingLotId = e.parkingLotId AND s.parkingSpotId = e.parkingSpotId
      | AND s.entry_sec <= e.ev_sec AND e.ev_sec <= s.exit_sec
      |GROUP BY 1, 2, 3 ORDER BY e.event_id""".stripMargin),

    "p46_cube_stats" -> (ParkingCte + """
      |SELECT COALESCE(parkingLotId, 'ALL') AS lot,
      |       COALESCE(vehicleType, 'ALL') AS vtype,
      |       count(*) AS n_events,
      |       COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS entries
      |FROM parking
      |GROUP BY CUBE (parkingLotId, vehicleType)
      |ORDER BY lot, vtype""".stripMargin),

    "p47_unregistered_plates" -> (ParkingCte + """
      |SELECT licensePlate, count(*) AS n_events
      |FROM parking
      |WHERE licensePlate NOT IN (SELECT u_plate FROM users)
      |GROUP BY 1 ORDER BY licensePlate""".stripMargin),

    "p48_shared_plates" -> (ParkingCte + """
      |SELECT DISTINCT licensePlate FROM parking WHERE eventType = 'PARKING_ENTRY'
      |INTERSECT
      |SELECT DISTINCT licensePlate FROM parking WHERE eventType = 'PARKING_EXIT'
      |ORDER BY licensePlate""".stripMargin),

    // gaps-and-islands twin of Spark's session_window(ts, '30 minutes'):
    // a new session starts exactly when the microsecond gap to the
    // previous event is >= 30 min (epoch_us keeps the boundary exact —
    // double epoch() could flip a borderline gap).
    "p49_plate_sessions" -> (ParkingCte + """,
      |o AS (
      |  SELECT licensePlate, ts, event_id,
      |         lag(ts) OVER (PARTITION BY licensePlate ORDER BY ts, event_id) AS prev
      |  FROM parking
      |), m AS (
      |  SELECT licensePlate, ts, event_id,
      |         CASE WHEN prev IS NULL
      |              OR epoch_us(ts) - epoch_us(prev) >= 1800000000 THEN 1
      |              ELSE 0 END AS brk
      |  FROM o
      |), g AS (
      |  SELECT licensePlate, ts,
      |         SUM(brk) OVER (PARTITION BY licensePlate ORDER BY ts, event_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM m
      |)
      |SELECT licensePlate,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
      |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
      |       count(*) AS n_events
      |FROM g GROUP BY licensePlate, grp
      |ORDER BY licensePlate, first_ts""".stripMargin),

    "p51_never_parked" -> (ParkingCte + """
      |SELECT u_plate AS licensePlate FROM users
      |EXCEPT
      |SELECT licensePlate FROM parking
      |ORDER BY licensePlate""".stripMargin),

    // deterministic lower discrete quantile: element ceil(q*n) of the
    // sorted duration list — integer selection, no interpolation, so both
    // engines agree exactly. The q literals are CAST to DOUBLE because
    // DuckDB otherwise parses them as DECIMAL and computes the index in
    // exact decimal while Spark uses binary doubles; for these constants
    // the two agree for all n <= 5000 (scanned), but only by IEEE
    // rounding luck — casting makes both engines evaluate the identical
    // double expression for any q and n.
    "p52_duration_percentiles" -> (ParkingCte + """,
      |seq AS (
      |  SELECT *, lag(eventType) OVER w AS prev_type, lag(ts) OVER w AS prev_ts
      |  FROM parking
      |  WINDOW w AS (PARTITION BY licensePlate, parkingSpotId ORDER BY event_id)
      |), durs AS (
      |  SELECT parkingLotId,
      |         CAST(CASE WHEN prev_type = 'PARKING_ENTRY'
      |              THEN FLOOR((FLOOR(epoch(ts)) - FLOOR(epoch(prev_ts))) / 60)
      |              ELSE FLOOR(duration_ms / 60000) END AS BIGINT) AS duration_min
      |  FROM seq WHERE eventType = 'PARKING_EXIT'
      |), byLot AS (
      |  SELECT parkingLotId, list_sort(list(duration_min)) AS ds
      |  FROM durs GROUP BY parkingLotId
      |)
      |SELECT parkingLotId,
      |       CAST(len(ds) AS BIGINT) AS n_sessions,
      |       ds[CAST(greatest(1, ceil(CAST(0.5 AS DOUBLE) * len(ds))) AS INT)] AS p50_min,
      |       ds[CAST(greatest(1, ceil(CAST(0.9 AS DOUBLE) * len(ds))) AS INT)] AS p90_min,
      |       ds[CAST(greatest(1, ceil(CAST(0.99 AS DOUBLE) * len(ds))) AS INT)] AS p99_min
      |FROM byLot ORDER BY parkingLotId""".stripMargin),

    "p57_unbalanced_entries" -> (ParkingCte + """
      |SELECT licensePlate FROM parking WHERE eventType = 'PARKING_ENTRY'
      |EXCEPT ALL
      |SELECT licensePlate FROM parking WHERE eventType = 'PARKING_EXIT'
      |ORDER BY licensePlate""".stripMargin),

    // full-outer entry/exit reconciliation (query key lives with the
    // relational family; the data is the parking events table)
    "p75_entry_exit_reconciliation" -> (ParkingCte + """
      |, e AS (SELECT licensePlate AS plate, count(*) AS n_entries
      |        FROM parking WHERE eventType = 'PARKING_ENTRY' GROUP BY 1),
      |x AS (SELECT licensePlate AS plate, count(*) AS n_exits
      |      FROM parking WHERE eventType = 'PARKING_EXIT' GROUP BY 1)
      |SELECT plate,
      |       COALESCE(n_entries, 0) AS n_entries,
      |       COALESCE(n_exits, 0) AS n_exits,
      |       COALESCE(n_entries, 0) - COALESCE(n_exits, 0) AS diff
      |FROM e FULL OUTER JOIN x USING (plate)
      |ORDER BY plate""".stripMargin),

    // RANGE frame on epoch seconds. DuckDB epoch() is a fractional DOUBLE
    // and CAST..BIGINT ROUNDS; Spark's unix_timestamp FLOORS — so floor
    // explicitly before the cast.
    "p76_trailing_hour_load" -> (ParkingCte + """
      |SELECT event_id, parkingLotId,
      |       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      |       count(*) OVER (PARTITION BY parkingLotId
      |                      ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |                      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
      |         AS events_last_hour
      |FROM parking ORDER BY event_id""".stripMargin),

    "p77_slot_event_sequence" -> (ParkingCte + """
      |SELECT event_id, eventType,
      |  lead(eventType, 1) OVER w AS next_event_type,
      |  first_value(licensePlate) OVER wr AS first_plate,
      |  nth_value(licensePlate, 2) OVER wr AS second_plate
      |FROM parking
      |WINDOW
      |  w AS (PARTITION BY parkingLotId, parkingSpotId ORDER BY ts, event_id),
      |  wr AS (PARTITION BY parkingLotId, parkingSpotId ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin),

    // the unpivot twin: every (lot, type) combination with its entry
    // count, zeros from the cross join — the long form of p73's wide rows.
    // The lots CTE is entry-filtered to MATCH the pivot's input universe
    // (a lot with zero entry events has no wide row to melt), same as p73
    "p83_vehicle_type_unpivot" -> (ParkingCte + """
      |, p AS (
      |  SELECT parkingLotId AS lot, vehicleType AS vt, count(*) AS c
      |  FROM parking WHERE eventType = 'PARKING_ENTRY' GROUP BY 1, 2
      |),
      |lots AS (SELECT DISTINCT parkingLotId AS lot FROM parking
      |         WHERE eventType = 'PARKING_ENTRY'),
      |vts AS (SELECT unnest(['car','motorcycle','suv','truck','van']) AS vehicle_type)
      |SELECT lots.lot, vts.vehicle_type, COALESCE(p.c, 0) AS n_entries
      |FROM lots CROSS JOIN vts
      |LEFT JOIN p ON p.lot = lots.lot AND p.vt = vts.vehicle_type
      |ORDER BY lots.lot, vts.vehicle_type""".stripMargin),

    "p79_grouping_sets" -> (ParkingCte + """
      |SELECT COALESCE(parkingLotId, 'ALL') AS lot,
      |       COALESCE(vehicleType, 'ALL') AS vtype,
      |       CAST(GROUPING(parkingLotId, vehicleType) AS BIGINT) AS gid,
      |       count(*) AS n_events
      |FROM parking
      |GROUP BY GROUPING SETS ((parkingLotId), (vehicleType), ())
      |ORDER BY lot, vtype""".stripMargin),

    "p72_rollup_stats" -> (ParkingCte + """
      |SELECT COALESCE(parkingLotId, 'ALL') AS lot,
      |       COALESCE(vehicleType, 'ALL') AS vtype,
      |       count(*) AS n_events,
      |       COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS entries
      |FROM parking
      |GROUP BY ROLLUP (parkingLotId, vehicleType)
      |ORDER BY lot, vtype""".stripMargin),

    // the pivot twin: one conditional count per (explicit) vehicle type —
    // exactly the aggregate Spark's pivot plans internally
    "p73_vehicle_type_pivot" -> (ParkingCte + """
      |SELECT parkingLotId AS lot,
      |       COUNT(CASE WHEN vehicleType = 'car' THEN 1 END) AS car,
      |       COUNT(CASE WHEN vehicleType = 'truck' THEN 1 END) AS truck,
      |       COUNT(CASE WHEN vehicleType = 'motorcycle' THEN 1 END) AS motorcycle,
      |       COUNT(CASE WHEN vehicleType = 'van' THEN 1 END) AS van,
      |       COUNT(CASE WHEN vehicleType = 'suv' THEN 1 END) AS suv
      |FROM parking WHERE eventType = 'PARKING_ENTRY'
      |GROUP BY 1 ORDER BY lot""".stripMargin),

    "p56_active_registered" -> (ParkingCte + """
      |SELECT u_plate, handicapped FROM users
      |WHERE u_plate IN (SELECT licensePlate FROM parking)
      |ORDER BY u_plate""".stripMargin),

    "p54_lot_cardinalities" -> (ParkingCte + """
      |SELECT parkingLotId,
      |       COUNT(DISTINCT licensePlate) AS n_plates,
      |       COUNT(DISTINCT parkingSpotId) AS n_spots,
      |       count(*) AS n_events
      |FROM parking GROUP BY 1 ORDER BY parkingLotId""".stripMargin),

    "p55_busiest_hours" -> (ParkingCte + """,
      |hourly AS (
      |  SELECT parkingLotId, strftime(ts, '%Y-%m-%d %H') AS hour_bucket,
      |         count(*) AS entries
      |  FROM parking WHERE eventType = 'PARKING_ENTRY' GROUP BY 1, 2
      |), ranked AS (
      |  SELECT *, CAST(dense_rank() OVER (PARTITION BY parkingLotId
      |                 ORDER BY entries DESC, hour_bucket) AS BIGINT) AS rnk
      |  FROM hourly
      |)
      |SELECT parkingLotId, rnk, hour_bucket, CAST(entries AS BIGINT) AS entries
      |FROM ranked WHERE rnk <= 3
      |ORDER BY parkingLotId, rnk, hour_bucket""".stripMargin),

    "p28_cumulative_series" -> (ParkingCte + """,
      |hourly AS (
      |  SELECT parkingLotId, strftime(ts, '%Y-%m-%d %H') AS hour_bucket,
      |         COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS entries,
      |         COUNT(CASE WHEN eventType = 'PARKING_EXIT' THEN 1 END) AS exits
      |  FROM parking GROUP BY 1, 2
      |), cum AS (
      |  SELECT parkingLotId, hour_bucket,
      |         CAST(entries AS BIGINT) AS entries, CAST(exits AS BIGINT) AS exits,
      |         CAST(SUM(entries) OVER w AS BIGINT) AS cum_entries,
      |         CAST(SUM(exits) OVER w AS BIGINT) AS cum_exits
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY parkingLotId ORDER BY hour_bucket
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT *, GREATEST(0, cum_entries - cum_exits) AS occupancy_running,
      |       CAST(GREATEST(0, cum_entries - cum_exits) AS DOUBLE) * 2.0
      |         AS revenue_running
      |FROM cum ORDER BY parkingLotId, hour_bucket""".stripMargin),

    "p32_duration_stats" -> (pairedCte + """
      |SELECT parkingLotId, COUNT(*) AS n_sessions,
      |       MIN(duration_min) AS min_duration_min,
      |       MAX(duration_min) AS max_duration_min,
      |       CAST(SUM(duration_min) AS DOUBLE) / COUNT(*) AS avg_duration_min
      |FROM paired GROUP BY parkingLotId ORDER BY parkingLotId""".stripMargin),

    "p33_entry_exit_ratio" -> (ParkingCte + """,
      |hourly AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS date_str, strftime(ts, '%H') AS hour_str,
      |         COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS entries,
      |         COUNT(CASE WHEN eventType = 'PARKING_EXIT' THEN 1 END) AS exits
      |  FROM parking GROUP BY 1, 2
      |)
      |SELECT date_str, hour_str, entries, exits,
      |       CASE WHEN exits = 0 THEN NULL
      |            ELSE CAST(entries AS DOUBLE) / exits END AS entry_exit_ratio
      |FROM hourly ORDER BY date_str, hour_str""".stripMargin),

    "p34_lot_turnover" -> (pairedCte + """
      |SELECT parkingLotId, COUNT(*) AS n_sessions
      |FROM paired GROUP BY parkingLotId
      |ORDER BY n_sessions DESC, parkingLotId LIMIT 1""".stripMargin),

    "p35_entries_heatmap" -> (ParkingCte + """
      |SELECT strftime(ts, '%H') AS hour_str, parkingLotId, COUNT(*) AS entries
      |FROM parking WHERE eventType = 'PARKING_ENTRY'
      |GROUP BY 1, 2 ORDER BY hour_str, parkingLotId""".stripMargin),

    "p29_daily_revenue" -> (ParkingCte + """,
      |per_lot AS (
      |  SELECT strftime(ts, '%Y-%m-%d') AS date_str, parkingLotId,
      |         COUNT(CASE WHEN eventType = 'PARKING_ENTRY' THEN 1 END) AS entries,
      |         COUNT(CASE WHEN eventType = 'PARKING_EXIT' THEN 1 END) AS exits
      |  FROM parking GROUP BY 1, 2
      |)
      |SELECT date_str,
      |       CAST(SUM(GREATEST(0, entries - exits)) AS DOUBLE) * 2.0 * 24.0
      |         AS daily_revenue
      |FROM per_lot GROUP BY date_str ORDER BY date_str""".stripMargin),

    // CDC upsert-merge registry: keep the base/mutation derivations in
    // lockstep with UserRegistry.baseUsers + ParkingAnalytics.userRegistryMerge
    "p85_user_registry_merge" -> """WITH base AS (
      |  SELECT 'P-' || CAST(c_custkey AS VARCHAR) AS u_plate,
      |         c_name AS username,
      |         lower(replace(c_name, 'Customer#', 'c')) || '@example.com' AS email,
      |         (c_custkey % 13 = 0) AS handicapped,
      |         'upsert' AS op, CAST(-1 AS BIGINT) AS mut_seq,
      |         CAST(NULL AS BIGINT) AS expires_at
      |  FROM customer WHERE c_custkey % 7 <> 0
      |), ups AS (
      |  SELECT 'P-' || CAST(c_custkey AS VARCHAR), c_name,
      |         'updated-' || CAST(c_custkey AS VARCHAR) || '@example.com',
      |         (c_custkey % 13 = 0), 'upsert', CAST(c_custkey AS BIGINT),
      |         CASE WHEN c_custkey % 17 = 0
      |              THEN CAST(500 + c_custkey % 1000 AS BIGINT) END
      |  FROM customer WHERE c_custkey % 5 = 0
      |), dels AS (
      |  SELECT 'P-' || CAST(c_custkey AS VARCHAR), NULL, NULL, NULL,
      |         'delete', CAST(1000000 + c_custkey AS BIGINT), NULL
      |  FROM customer WHERE c_custkey % 11 = 0
      |), muts AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM ups UNION ALL SELECT * FROM dels
      |), latest AS (
      |  SELECT *, row_number() OVER (PARTITION BY u_plate ORDER BY mut_seq DESC) AS rn
      |  FROM muts
      |)
      |SELECT u_plate, username, email, handicapped, mut_seq AS version
      |FROM latest
      |WHERE rn = 1 AND op = 'upsert'
      |  AND (expires_at IS NULL OR expires_at > 1000)
      |ORDER BY u_plate""".stripMargin)
}
