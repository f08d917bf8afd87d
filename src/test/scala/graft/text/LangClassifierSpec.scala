package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LangClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic corpus whose vocabulary genuinely differs by class —
    * the driver corpus's text is the same token soup for every lang
    * label (majority-class prediction is Bayes-optimal there, measured
    * 0.43 = the en base rate), so demonstrating that the classifier
    * LEARNS needs planted structure, the clustered-PQ-test convention.
    * Each class has 8 exclusive tokens plus shared fillers. */
  private def planted = {
    val vocab = Map(
      "aa" -> (0 until 8).map(i => s"alpha$i"),
      "bb" -> (0 until 8).map(i => s"beta$i"),
      "cc" -> (0 until 8).map(i => s"gamma$i"))
    val langs = vocab.keys.toSeq.sorted
    (0L until 300L).map { id =>
      val lang = langs((id % 3).toInt)
      val own = vocab(lang)
      val toks = (0 until 20).map { j =>
        if (j % 3 == 0) "filler" else own(((id + j) % own.length).toInt)
      }
      (id, lang, toks.mkString(" "))
    }.toDF("doc_id", "lang", "text")
  }

  "langScorer" should "learn planted per-class vocabularies (holdout accuracy ~1)" in {
    val scored = LangClassifier.langScorer(planted, "doc_id", "text", "lang")
    val holdout = scored.filter(pmod(col("doc_id"), lit(10L)) === 0L)
    val n = holdout.count()
    val correct = holdout
      .filter(col("predicted_lang") === col("label_lang")).count()
    n shouldBe 30L
    correct shouldBe n // exclusive vocabularies → perfect holdout accuracy
  }

  it should "count tokens and produce a full per-doc frame on the driver corpus" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = LangClassifier.langScorer(docs, "doc_id", "text", "lang")
    scored.count() shouldBe docs.count()
    // every doc scored: n_tokens > 0 (the corpus has non-empty text) and
    // votes + oov account for every token
    scored.filter(col("n_tokens") === 0L).count() shouldBe 0L
    scored.filter(col("top_votes") > col("n_tokens")).count() shouldBe 0L
  }

  it should "abstain to 'und' when every token is unseen" in {
    // doc 30 is holdout-only vocabulary: its buckets never occur in the
    // train split, so every token is OOV and the prediction falls back
    val df = (Seq((1L, "aa", "hello world hello"), (2L, "aa", "hello again world"),
      (11L, "bb", "other words here"), (21L, "aa", "hello other world"),
      (30L, "aa", "zzzunseen qqqunseen")))
      .toDF("doc_id", "lang", "text")
    val scored = LangClassifier.langScorer(df, "doc_id", "text", "lang")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("predicted_lang"), r.getAs[Long]("n_oov"))).toMap
    scored(30L)._1 shouldBe "und"
    scored(30L)._2 shouldBe 2L
  }

  "langScore" should "equal the fused scorer given the train-split model (minus labels)" in {
    val scoredFused = LangClassifier.langScorer(planted, "doc_id", "text", "lang")
      .drop("label_lang").collect().map(_.toSeq)
    val model = LangClassifier.langVotedModel(
      planted.filter(pmod(col("doc_id"), lit(10L)) =!= 0L),
      "doc_id", "text", "lang")
    val scoredSplit = LangClassifier.langScore(planted, "doc_id", "text", model)
      .collect().map(_.toSeq)
    scoredSplit shouldBe scoredFused
  }

  it should "fail fast on null labels instead of NPEing in the class collection" in {
    val df = Seq((1L, Option("aa"), "hello world"), (2L, None, "other text"),
      (3L, Option("aa"), "hello again"))
      .toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException] {
      LangClassifier.langScorer(df, "doc_id", "text", "lang").collect()
    }
    e.getMessage should include("non-null")
  }

  "langConfusion" should "partition the holdout split across its cells" in {
    val scored = LangClassifier.langScorer(planted, "doc_id", "text", "lang")
    val cells = LangClassifier.langConfusion(scored)
    cells.agg(sum("n_docs")).collect().head.getLong(0) shouldBe 30L
    // perfect accuracy → only diagonal cells
    cells.filter(col("label_lang") =!= col("predicted_lang")).count() shouldBe 0L
  }
}
