package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // right: per-key snapshot series; left: lookups around the boundaries
  private def snaps = Seq(
    ("k1", 10L, 100L), ("k1", 20L, 200L), ("k1", 30L, 300L),
    ("k2", 15L, 555L)
  ).toDF("key", "rt", "v")

  private def lookups = Seq(
    ("k1", 1L, 5L),   // before any snapshot
    ("k1", 2L, 10L),  // exactly on a snapshot
    ("k1", 3L, 25L),  // between snapshots
    ("k1", 4L, 99L),  // after the last
    ("k2", 5L, 15L),  // tie on the other key
    ("k3", 6L, 50L)   // key with no snapshots at all
  ).toDF("key", "id", "lt")

  private def run(strict: Boolean): Map[Long, Option[Long]] =
    AsOfJoin.asOf(lookups, snaps, Seq("key"), "lt", "rt", Seq("v"), strict)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getAs[Long]("v"))))
      .toMap

  "asOf" should "attach the latest at-or-before payload per key (<= semantics)" in {
    run(strict = false) shouldBe Map(
      1L -> None, 2L -> Some(100L), 3L -> Some(200L), 4L -> Some(300L),
      5L -> Some(555L), 6L -> None)
  }

  it should "exclude equal-time rows under strict (<) semantics" in {
    run(strict = true) shouldBe Map(
      1L -> None, 2L -> None, 3L -> Some(200L), 4L -> Some(300L),
      5L -> None, 6L -> None)
  }

  it should "emit exactly one row per left row with left columns intact" in {
    val out = AsOfJoin.asOf(lookups, snaps, Seq("key"), "lt", "rt", Seq("v"))
    out.count() shouldBe 6L
    out.columns.toSeq shouldBe Seq("key", "id", "lt", "v")
  }

  it should "attach the latest right ROW even when its payload value is null" in {
    // regression for the per-column last(ignoreNulls) formulation, which
    // skipped a null-payload right row and attached the STALE value 100
    val right = Seq(("k1", 10L, Some(100L)), ("k1", 20L, None))
      .toDF("key", "rt", "v")
    val left = Seq(("k1", 1L, 25L), ("k1", 2L, 15L)).toDF("key", "id", "lt")
    val got = AsOfJoin.asOf(left, right, Seq("key"), "lt", "rt", Seq("v"))
      .collect().map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getAs[Long]("v"))))
      .toMap
    got shouldBe Map(1L -> None, 2L -> Some(100L))
  }

  "asOfRanged" should "return exactly the fixture answers through the sub-split plan" in {
    val got = AsOfJoin.asOfRanged(lookups, snaps, Seq("key"), "lt", "rt",
        Seq("v"), strict = false, numRanges = 4)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getAs[Long]("v"))))
      .toMap
    got shouldBe Map(
      1L -> None, 2L -> Some(100L), 3L -> Some(200L), 4L -> Some(300L),
      5L -> Some(555L), 6L -> None)
  }
}
