package graft.functions

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class WindowKeysSpec extends SparkSpec {
  import spark.implicits._

  private def th(text: org.apache.spark.sql.Column) =
    transform(TextPrims.tokens(text), TextPrims.charHash _)

  "WindowKeys" should "equal the HOF spec on real documents across window sizes" in {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("text")).limit(300)
    for (k <- Seq(2, 3, 8)) {
      val rows = docs.select(
        TextPrims.hashedWindowKeys(th(col("text")), k).as("fast"),
        TextPrims.hashedWindowKeysHof(th(col("text")), k).as("spec")).collect()
      rows.length shouldBe 300
      rows.foreach(r => withClue(s"k=$k: ") {
        r.getSeq[Long](0) shouldBe r.getSeq[Long](1)
      })
    }
  }

  it should "replicate the HOF edge semantics: short, single-window and empty-token inputs" in {
    val rows = Seq(
      "one two three four five six seven eight", // exactly one 8-window
      "one two three",                           // < k tokens -> empty
      ""                                         // empty text -> one empty token
    ).toDF("text")
      .select(
        TextPrims.hashedWindowKeys(th(col("text")), 8).as("fast"),
        TextPrims.hashedWindowKeysHof(th(col("text")), 8).as("spec"))
      .collect()
    rows.foreach(r => r.getSeq[Long](0) shouldBe r.getSeq[Long](1))
    rows(0).getSeq[Long](0).length shouldBe 1
    rows(1).getSeq[Long](0) shouldBe empty
  }
}
