package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSamplerSpec extends SparkSpec {
  import spark.implicits._

  // Two "domains" with disjoint vocabulary: target docs repeat "alpha
  // beta", raw docs are either target-like ("alpha beta ...") or
  // off-domain ("gamma delta ..."). Bigrams separate them perfectly.
  private def docs = Seq(
    (1L, "alpha beta alpha beta alpha beta", "t"),
    (2L, "alpha beta alpha beta", "t"),
    (10L, "alpha beta alpha beta alpha", "r"),
    (11L, "gamma delta gamma delta gamma", "r"),
    (12L, "gamma delta epsilon zeta", "r"),
    (13L, "alpha beta gamma delta", "r")
  ).toDF("doc_id", "text", "dom")

  "dsirSelect" should "rank target-like raw documents above off-domain ones" in {
    val out = ImportanceSampler.dsirSelect(docs, "doc_id", "text",
        col("dom") === "t", k = 10)
      .collect()
    // only raw docs are candidates, ranked by target-vote share
    out.map(_.getLong(0)).toSet shouldBe Set(10L, 11L, 12L, 13L)
    out.head.getLong(0) shouldBe 10L // pure target vocabulary wins
    val byId = out.map(r => r.getLong(0) -> r.getDouble(4)).toMap
    byId(10L) should be > byId(11L)
    byId(10L) should be > byId(12L)
    // the mixed doc sits between the pure cases
    byId(13L) should be < byId(10L)
    byId(13L) should be > byId(11L)
    // sel_rank is the 1..n dense ordering under (importance DESC, id)
    out.map(_.getAs[Long]("sel_rank")).toSeq shouldBe (1L to 4L)
  }

  it should "cap the selection at k with the deterministic tiebreak" in {
    val out = ImportanceSampler.dsirSelect(docs, "doc_id", "text",
        col("dom") === "t", k = 2)
      .collect()
    out.length shouldBe 2
    out.map(_.getLong(0)).toSeq shouldBe Seq(10L, 13L)
  }

  it should "match the frozen train/score split on the raw slice" in {
    val model = ImportanceSampler.dsirModel(docs, "doc_id", "text", col("dom") === "t")
    val split = ImportanceSampler.dsirScore(docs, "doc_id", "text", model)
      .filter(col("doc_id") >= 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val fused = ImportanceSampler.dsirSelect(docs, "doc_id", "text",
        col("dom") === "t", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    split.sortBy(_._1) shouldBe fused.sortBy(_._1)
  }

  it should "exclude raw documents with no bigram features" in {
    val withSingleton = docs.union(Seq((14L, "solo", "r")).toDF("doc_id", "text", "dom"))
    val out = ImportanceSampler.dsirSelect(withSingleton, "doc_id", "text",
      col("dom") === "t", k = 10)
    out.filter(col("doc_id") === 14L).count() shouldBe 0
  }
}
