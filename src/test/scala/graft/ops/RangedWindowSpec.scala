package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins [[RangedWindow.trailingCount]] EXACTLY equal to the plain
  * single-partition-per-key RANGE window on random keyed time series —
  * including equal-time ties straddling range boundaries, frames wider
  * than the data span, frame 0, and every clamp path (numRanges larger
  * than the span can hold, numRanges = 1, empty input). */
class RangedWindowSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // few keys (the low-cardinality shape the operator exists for), times
  // clustered so ties and boundary hits are common
  private val rowGen: Gen[(String, Long)] = for {
    k <- Gen.oneOf("lotA", "lotB", "lotC")
    t <- Gen.chooseNum(0L, 400L)
  } yield (k, t)

  private def naive(df: org.apache.spark.sql.DataFrame, frame: Long) = {
    val w = Window.partitionBy("key").orderBy(col("t").cast("long"))
      .rangeBetween(-frame, Window.currentRow)
    df.withColumn("c", count(lit(1)).over(w))
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("id", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  "trailingCount" should "equal the single window on random data across frames and range counts" in {
    val rows = samples(rowGen, 300, 77L).zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toLong) }
    val df = rows.toDF("key", "t", "id")
    for (frame <- Seq(0L, 1L, 13L, 60L, 1000L); nr <- Seq(1, 2, 5, 24, 500)) {
      val exp = canon(naive(df, frame))
      val got = canon(RangedWindow.trailingCount(
        df, Seq("key"), "t", frame, numRanges = nr, out = "c"))
      withClue(s"frame=$frame numRanges=$nr: ") { got shouldBe exp }
    }
  }

  it should "handle ties exactly on the range boundary (RANGE frame tie semantics)" in {
    // width will be 10 for span 40 / 4 ranges; pile ties at t=10 and t=20
    val rows = Seq(
      ("k", 0L, 1L), ("k", 9L, 2L), ("k", 10L, 3L), ("k", 10L, 4L),
      ("k", 10L, 5L), ("k", 19L, 6L), ("k", 20L, 7L), ("k", 20L, 8L),
      ("k", 29L, 9L), ("k", 39L, 10L))
    val df = rows.toDF("key", "t", "id")
    for (frame <- Seq(0L, 5L, 10L)) {
      val exp = canon(naive(df, frame))
      val got = canon(RangedWindow.trailingCount(
        df, Seq("key"), "t", frame, numRanges = 4, out = "c"))
      withClue(s"frame=$frame: ") { got shouldBe exp }
    }
  }

  it should "match the plain window on null keys and null times (round-8 review fix)" in {
    // null keys form one window GROUP (SQL partitioning treats nulls
    // equal); null times form one RANGE peer group per key, sorted first,
    // whose frame is the group itself. The join-based remedy used to drop
    // the former and zero the latter.
    val rows: Seq[(String, java.lang.Long, Long)] = Seq(
      ("k1", 5L, 1L), ("k1", 15L, 2L), ("k1", null, 3L), ("k1", null, 4L),
      (null, 5L, 5L), (null, 8L, 6L), (null, null, 7L),
      ("k2", 30L, 8L), (null, 40L, 9L))
    val df = rows.toDF("key", "t", "id")
    for (frame <- Seq(0L, 10L, 100L); nr <- Seq(1, 3, 16)) {
      val exp = canon(naive(df, frame))
      val got = canon(RangedWindow.trailingCount(
        df, Seq("key"), "t", frame, numRanges = nr, out = "c"))
      withClue(s"frame=$frame numRanges=$nr: ") { got shouldBe exp }
    }
    // the null-time path really carries its cohort count, not 0
    val got = RangedWindow.trailingCount(df, Seq("key"), "t", 10L, 4, "c")
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    got(3L) shouldBe 2L // k1's two null-time rows are each other's peers
    got(7L) shouldBe 1L // null-key null-time singleton
  }

  it should "return all-null-time input through the plain-window fallback" in {
    val rows: Seq[(String, java.lang.Long, Long)] =
      Seq(("k", null, 1L), ("k", null, 2L), ("j", null, 3L))
    val df = rows.toDF("key", "t", "id")
    canon(RangedWindow.trailingCount(df, Seq("key"), "t", 5L, 4, "c")) shouldBe
      canon(naive(df, 5L))
  }

  it should "return zero rows on empty input" in {
    val df = Seq.empty[(String, Long, Long)].toDF("key", "t", "id")
    RangedWindow.trailingCount(df, Seq("key"), "t", 10L, 8, "c")
      .count() shouldBe 0L
  }

  it should "actually partition by (key, range) — more than one task per key" in {
    val rows = (0L until 2000L).map(t => ("k", t, t))
    val df = rows.toDF("key", "t", "id")
    val ranged = RangedWindow.trailingCount(df, Seq("key"), "t", 60L, 8, "c")
    // the plan's window partition spec must include the synthetic range id
    val planStr = ranged.queryExecution.executedPlan.toString
    assert(planStr.contains("__rng"), "window should partition by (keys, __rng)")
    canon(ranged) shouldBe canon(naive(df, 60L))
  }

  it should "fail loudly (not OOM) on a high-cardinality key column" in {
    // keys x ranges must fit the driver; the guard fetches at most
    // cap + 1 offset rows and errors naming the plain range window
    val big = spark.range(150000L).select(
      col("id").as("key"), col("id").as("t"), col("id").as("id"))
    val e = intercept[IllegalArgumentException] {
      RangedWindow.trailingCount(big, Seq("key"), "t", 10L, 1, "c")
    }
    e.getMessage should include("low-cardinality")
    e.getMessage should include("range between")
  }
}
