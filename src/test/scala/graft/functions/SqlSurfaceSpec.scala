package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The SQL registration surface: every custom expression callable from
  * spark.sql(...) must produce exactly what its Column-API / HOF-spec
  * form produces (same builders GraftExtensions injects at build time —
  * registerAll reaches the registry of the already-built test session). */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.registerAll(spark)

  "the SQL surface" should "evaluate poly_hash to the cross-engine pinned value" in {
    spark.sql("SELECT poly_hash('abc')").head.getLong(0) shouldBe 304891L
  }

  it should "evaluate minhash_sig and simhash_sig like their HOF specs" in {
    val df = Seq(Tuple1(Seq(11L, 22L, 33L, 987654321L))).toDF("h")
    df.createOrReplaceTempView("v_sig")
    spark.sql("SELECT minhash_sig(h, 8) FROM v_sig").head.getSeq[Long](0) shouldBe
      df.select(TextPrims.minhashSigHof(col("h"), 8)).head.getSeq[Long](0)
    spark.sql("SELECT simhash_sig(h, 30) FROM v_sig").head.getLong(0) shouldBe
      df.select(TextPrims.simhashHof(col("h"), 30)).head.getLong(0)
  }

  it should "evaluate cosine_sim and gram_stats like their spec twins" in {
    val df = Seq((Array(1.0f, 2.0f, 0.5f), Array(0.5f, 1.0f, 2.0f), "abcdefghij"))
      .toDF("a", "b", "s")
    df.createOrReplaceTempView("v_cg")
    spark.sql("SELECT cosine_sim(a, b) FROM v_cg").head.getDouble(0) shouldBe
      df.select(AnnPrims.cosineHof(col("a"), col("b"))).head.getDouble(0)
    spark.sql("SELECT gram_stats(s, 8) FROM v_cg").head.getStruct(0) shouldBe
      df.select(GramStats(col("s"), 8)).head.getStruct(0)
  }

  it should "evaluate topk as a SQL aggregate matching the Column form" in {
    val df = Seq((1L, 0.9, 10L), (1L, 0.7, 11L), (1L, 0.9, 9L), (2L, 0.1, 12L))
      .toDF("g", "sim", "id")
    df.createOrReplaceTempView("v_topk")
    val sql = spark.sql(
      "SELECT g, topk(sim, id, 2) AS top FROM v_topk GROUP BY g ORDER BY g")
      .collect().map(_.toString).toSeq
    val api = df.groupBy("g")
      .agg(TopKAgg.topk(col("sim"), col("id"), 2).as("top")).orderBy("g")
      .collect().map(_.toString).toSeq
    sql shouldBe api
    sql.head should include("9,0.9") // tie on sim → smaller id first
  }

  it should "reject non-literal codegen parameters" in {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(1L), cast(id AS INT)) FROM range(1)").collect()
    }
    e.getMessage should include("literal integer")
  }
}
