package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic event generator (SURVEY.md §2.1 S13 + §2.7 F11 — reference
  * srvc-io GeneratorService.scala:11-76,133-186): the plate-pattern DSL and
  * the stateful entry/exit session lifecycle, re-expressed deterministically
  * (seeded arithmetic, no RNG state) so property tests can replay exact
  * universes. Events come out in the engine's canonical flat shape.
  */
object Generator {

  /** Plate pattern DSL (reference GeneratorService.scala:133-186):
    * 'a' → uppercase letter, 'd' → digit, '[xyz]' → one of the bracketed
    * characters, anything else literal. Deterministic in (pattern, seed). */
  def plate(pattern: String, seed: Long): String = {
    var s = seed
    def next(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound).toInt + bound) % bound
    }
    val out = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case 'a' => out.append(('A' + next(26)).toChar); i += 1
        case 'd' => out.append(('0' + next(10)).toChar); i += 1
        case '[' =>
          val j = pattern.indexOf(']', i)
          require(j > i, s"unclosed choice bracket in pattern: $pattern")
          val choices = pattern.substring(i + 1, j)
          out.append(choices.charAt(next(choices.length)))
          i = j + 1
        case c => out.append(c); i += 1
      }
    }
    out.toString
  }

  /** A deterministic parking universe: `nClosed` full entry/exit sessions
    * followed by `nOpen` dangling entries (sessions still parked — the
    * generator's scheduled-exit state, GeneratorService.scala:11-41).
    * Session i parks on spot i % spots in lot (i % lots)+1; closed session
    * i spans durations of (i % 120)+1 minutes. event_ids are globally
    * ts-ordered; open entries come last so latest-state semantics see them
    * as currently parked. Built with spark.range — scales to any size
    * without driver-side row materialization. */
  def sessions(spark: SparkSession, nClosed: Int, nOpen: Int,
               lots: Int = 3, spots: Int = 100, startEpoch: Long = 1700000000L): DataFrame = {
    def common(idCol: org.apache.spark.sql.Column) = Seq(
      concat(lit("G-"), idCol.cast("string")).as("licensePlate"),
      concat(lit("lot-0"), ((idCol % lots) + 1).cast("string")).as("parkingLotId"),
      (idCol % spots).cast("string").as("parkingSpotId"),
      (idCol % 11 === 0).as("isSlotHandicapped"),
      element_at(array(lit("car"), lit("truck"), lit("motorcycle"), lit("van"), lit("suv")),
        (idCol % 5 + 1).cast("int")).as("vehicleType"))

    val closed = spark.range(nClosed.toLong)
      .select(explode(array(
        struct(
          (col("id") * 2).as("event_id"),
          timestamp_seconds(lit(startEpoch) + col("id") * 60).as("ts"),
          lit("PARKING_ENTRY").as("eventType"),
          lit(null).cast("long").as("duration_ms")),
        struct(
          (col("id") * 2 + 1).as("event_id"),
          timestamp_seconds(lit(startEpoch) + col("id") * 60 + ((col("id") % 120) + 1) * 60)
            .as("ts"),
          lit("PARKING_EXIT").as("eventType"),
          (((col("id") % 120) + 1) * 60000).as("duration_ms")))).as("e"),
        col("id"))
      .select(col("e.*") +: common(col("id")): _*)
    val open = spark.range(nOpen.toLong)
      .select(Seq(
        (lit(2L * nClosed) + col("id")).as("event_id"),
        timestamp_seconds(lit(startEpoch) + lit(86400) + col("id") * 60).as("ts"),
        lit("PARKING_ENTRY").as("eventType"),
        lit(null).cast("long").as("duration_ms")) ++
        common(lit(nClosed.toLong) + col("id")): _*)
    closed.unionByName(open)
  }
}
