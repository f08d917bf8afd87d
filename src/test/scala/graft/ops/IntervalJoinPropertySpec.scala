package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the interval-join family: on random keyed fixtures,
  * the scalable plans (binned range join, union-tag-window as-of) must
  * return EXACTLY what the naive definitional implementations return —
  * including bin-boundary points, equal-time ties, empty keys, and
  * degenerate intervals the hand-picked fixtures can't enumerate.
  * Deterministic sampling (fixed seeds) keeps the suite reproducible. */
class IntervalJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val keyGen = Gen.oneOf("k1", "k2", "k3", "k4")
  // times cluster near bin multiples of 10 so boundaries get hit often
  private val timeGen = Gen.chooseNum(-25L, 45L)

  private def intervalGen: Gen[(String, Long, Long, Long)] = for {
    k <- keyGen; id <- Gen.chooseNum(1L, 100000L)
    a <- timeGen; span <- Gen.chooseNum(-3L, 30L) // negative span = degenerate
  } yield (k, id, a, a + span)

  private def pointGen: Gen[(String, Long, Long)] = for {
    k <- keyGen; id <- Gen.chooseNum(1L, 100000L); t <- timeGen
  } yield (k, id, t)

  "pointInInterval" should "equal the naive theta join on random data for every bin width" in {
    val ivs = samples(intervalGen, 60, 1000L).distinct
    val pts = samples(pointGen, 60, 5000L).distinct
    val intervals = ivs.toDF("key", "iv_id", "lo", "hi")
    val points = pts.toDF("key", "pt_id", "t")
    val naive = (for {
      (k, pid, t) <- pts
      (ik, iid, lo, hi) <- ivs
      if ik == k && lo <= t && t <= hi
    } yield (pid, iid)).toSet
    for (bin <- Seq(1L, 7L, 10L, 1000L)) {
      val got = RangeJoin.pointInInterval(
          points, intervals, Seq("key"), "t", "lo", "hi", binWidth = bin)
        .collect().map(r => (r.getAs[Long]("pt_id"), r.getAs[Long]("iv_id"))).toSet
      withClue(s"binWidth=$bin: ") { got shouldBe naive }
    }
  }

  "asOf" should "equal the naive latest-at-or-before lookup on random data, both tie modes" in {
    val snaps = samples(intervalGen, 50, 9000L).distinct
      .map { case (k, id, t, _) => (k, t, id) } // (key, rt, payload v)
    val looks = samples(pointGen, 50, 13000L).distinct
      .zipWithIndex.map { case ((k, _, t), i) => (k, i.toLong, t) } // unique ids
    val right = snaps.toDF("key", "rt", "v")
    val left = looks.toDF("key", "id", "lt")
    for (strict <- Seq(false, true)) {
      // naive: per left row, the right row with max time (tie → ANY is
      // wrong; the operator takes last in (t, tag) order, which for equal
      // rt collapses to the max payload only if unique — make rt unique
      // per key to keep the reference well-defined)
      val uniq = snaps.groupBy(s => (s._1, s._2)).map(_._2.head).toSeq
      val rightU = uniq.toDF("key", "rt", "v")
      val naive = looks.map { case (k, id, lt) =>
        val cands = uniq.filter(s => s._1 == k && (if (strict) s._2 < lt else s._2 <= lt))
        id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
      }.toMap
      val got = AsOfJoin.asOf(left, rightU, Seq("key"), "lt", "rt", Seq("v"), strict)
        .collect().map { r =>
          r.getAs[Long]("id") ->
            (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getAs[Long]("v")))
        }.toMap
      withClue(s"strict=$strict: ") { got shouldBe naive }
    }
  }

  "asOfRanged" should "equal the single-window as-of on random data for every range count" in {
    val snaps = samples(intervalGen, 50, 21000L).distinct
      .map { case (k, id, t, _) => (k, t, id) }
    val looks = samples(pointGen, 50, 31000L).distinct
      .zipWithIndex.map { case ((k, _, t), i) => (k, i.toLong, t) }
    val uniq = snaps.groupBy(s => (s._1, s._2)).map(_._2.head).toSeq
    val right = uniq.toDF("key", "rt", "v")
    val left = looks.toDF("key", "id", "lt")
    def rows(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
      df.collect().map { r =>
        r.getAs[Long]("id") ->
          (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getAs[Long]("v")))
      }.toMap
    for (strict <- Seq(false, true)) {
      val plain = rows(
        AsOfJoin.asOf(left, right, Seq("key"), "lt", "rt", Seq("v"), strict))
      for (nr <- Seq(1, 2, 3, 8, 64)) {
        val ranged = rows(AsOfJoin.asOfRanged(left, right, Seq("key"), "lt",
          "rt", Seq("v"), strict, numRanges = nr))
        withClue(s"strict=$strict numRanges=$nr: ") { ranged shouldBe plain }
      }
    }
  }
}
