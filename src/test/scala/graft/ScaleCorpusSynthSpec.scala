package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => arrSize}

/** The scaling harness's synthetic inputs must actually HAVE the structure
  * the curves claim to measure — otherwise the recorded curves measure
  * nothing. Pins: the corpus's 10% exact-dup / 10% near-dup rates and
  * bounded doc lengths; the pair graph's component structure (size-1000
  * components whose count scales with the edge count). */
class ScaleCorpusSynthSpec extends SparkSpec {

  "synthCorpus" should "hold 10% exact-dup and 10% near-dup rates at any size" in {
    val c = ScaleCorpusBench.synthCorpus(spark, 1000L).cache()
    c.count() shouldBe 1000L
    // x7 is an exact copy of x0: exactly 100 duplicated texts
    c.agg(countDistinct(col("text"))).head().getLong(0) shouldBe 900L
    // x8 is a NEAR duplicate of x0: differs from it, but shares most tokens
    val pairs = c.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 8).as("doc_id"), col("text").as("orig"))
      .join(c, "doc_id")
    pairs.filter(col("text") === col("orig")).count() shouldBe 0L
    val sharedFrac = pairs.select(
      (arrSize(array_intersect(split(col("text"), " "), split(col("orig"), " ")))
        .cast("double") / arrSize(split(col("orig"), " "))).as("f"))
      .agg(avg("f")).head().getDouble(0)
    sharedFrac should be > 0.85
    // doc lengths stay in the declared 50–149 token band
    val lens = c.select(arrSize(split(col("text"), " ")).as("n"))
      .agg(min("n"), max("n")).head()
    lens.getInt(0) should be >= 50
    lens.getInt(1) should be <= 149
    c.unpersist()
  }

  "synthEdges" should "produce ~1000-node components whose count scales with n" in {
    val groups = graft.text.TextDedup.duplicateGroups(
      ScaleCorpusBench.synthEdges(spark, 100000L), "doc_a", "doc_b")
    // 100k edges = blocks 0–999 fused in runs of 10, plus the final
    // id (100000) alone in block 1000 as a self-loop singleton
    val profile = groups.groupBy("group_id").count().cache()
    profile.count() shouldBe 101L
    // each run: 10 blocks × 100 nodes, minus the 9 rim nodes whose
    // chain edge was traded for the hub-to-hub glue
    profile.filter(col("count") === 991).count() shouldBe 100L
    profile.filter(col("count") === 1).count() shouldBe 1L
    profile.unpersist()
  }
}
