package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins [[Percentiles.exactRankSelect]] EXACTLY equal to the naive
  * definitional rank selection (one full sort per key) on random data —
  * heavy ties, skewed distributions, single-value keys, tiny keys
  * (n < numBuckets), and every bucket count including the degenerate 1
  * (which IS the naive plan). */
class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private val Qs = Seq(0.5, 0.9, 0.99)

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  /** The definition: value at ascending rank max(1, ceil(q·n)) per key. */
  private def naive(df: org.apache.spark.sql.DataFrame): Set[(String, Double, Long, Long)] = {
    val byKey = Window.partitionBy("k")
    val ranked = df
      .withColumn("rn", row_number().over(byKey.orderBy("v")))
      .withColumn("n", count(lit(1)).over(byKey))
    Qs.flatMap { q =>
      ranked.filter(col("rn") === greatest(lit(1), ceil(lit(q) * col("n"))).cast("int"))
        .collect().map(r => (r.getAs[String]("k"), q, r.getAs[Long]("v"), r.getAs[Long]("n")))
    }.toSet
  }

  private def bucketed(df: org.apache.spark.sql.DataFrame, buckets: Int) =
    Percentiles.exactRankSelect(df, "k", "v", Qs, buckets)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Double]("q"),
        r.getAs[Long]("v"), r.getAs[Long]("n"))).toSet

  "exactRankSelect" should "equal the naive full-sort rank selection on random data" in {
    val rowGen = for {
      k <- Gen.oneOf("a", "b", "c", "d")
      // mixture: heavy ties at small values, a long tail, negatives
      v <- Gen.frequency(5 -> Gen.chooseNum(-3L, 5L), 3 -> Gen.chooseNum(0L, 100L),
        1 -> Gen.chooseNum(0L, 1000000L))
    } yield (k, v)
    val df = samples(rowGen, 500, 31L).toDF("k", "v")
    val exp = naive(df)
    for (buckets <- Seq(1, 2, 7, 64, 1024)) {
      withClue(s"buckets=$buckets: ") { bucketed(df, buckets) shouldBe exp }
    }
  }

  it should "handle single-value and single-row keys" in {
    val df = (Seq.fill(100)(("mono", 42L)) ++ Seq(("one", 7L))).toDF("k", "v")
    bucketed(df, 64) shouldBe naive(df)
  }

  it should "return nothing on empty input" in {
    val df = Seq.empty[(String, Long)].toDF("k", "v")
    Percentiles.exactRankSelect(df, "k", "v", Qs).count() shouldBe 0L
  }

  it should "fail loudly (not OOM) on a high-cardinality key column" in {
    // the charter is low-cardinality keys; the guard fetches at most
    // cap + 1 bound rows, so this errors in bounded memory naming the
    // plain-window alternative instead of collecting 150k rows silently
    val big = spark.range(150000L)
      .select(col("id").as("k"), col("id").as("v"))
    val e = intercept[IllegalArgumentException] {
      Percentiles.exactRankSelect(big, "k", "v", Seq(0.5))
    }
    e.getMessage should include("low-cardinality")
    e.getMessage should include("row_number()")
  }
}
