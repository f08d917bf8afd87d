package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // bin width 10; interval (k1, 5..25) spans bins 0,1,2 — candidates must
  // come from every bin it overlaps, and boundaries are inclusive
  private def intervals = Seq(
    ("k1", 101L, 5L, 25L),
    ("k1", 102L, 30L, 31L),
    ("k2", 201L, 0L, 100L),
    ("k1", 103L, 50L, 40L) // degenerate (lo > hi): must match nothing
  ).toDF("key", "iv_id", "lo", "hi")

  private def points = Seq(
    ("k1", 1L, 5L),   // on lo boundary
    ("k1", 2L, 25L),  // on hi boundary, different bin than lo
    ("k1", 3L, 15L),  // interior, middle bin
    ("k1", 4L, 26L),  // outside every k1 interval
    ("k1", 5L, 45L),  // inside the degenerate interval's [hi, lo] span
    ("k2", 6L, 99L),  // other key
    ("k3", 7L, 10L)   // key with no intervals
  ).toDF("key", "pt_id", "t")

  private def matches: Set[(Long, Long)] =
    RangeJoin.pointInInterval(points, intervals, Seq("key"), "t", "lo", "hi", binWidth = 10L)
      .collect().map(r => (r.getAs[Long]("pt_id"), r.getAs[Long]("iv_id"))).toSet

  "pointInInterval" should "match inclusive boundaries across bin borders and nothing else" in {
    matches shouldBe Set((1L, 101L), (2L, 101L), (3L, 101L), (6L, 201L))
  }

  it should "agree with the naive theta join on the same data" in {
    val naive = points.as("p").join(intervals.as("i"),
        $"p.key" === $"i.key" && $"i.lo" <= $"p.t" && $"p.t" <= $"i.hi")
      .select($"p.pt_id", $"i.iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    matches shouldBe naive
  }
}
