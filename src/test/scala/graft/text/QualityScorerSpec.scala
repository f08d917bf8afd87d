package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the trained quality scorer's train/score split API (the p88
  * bigramModel/bigramScore convention), its label identity with the p18
  * quality heuristic, OOV abstention, determinism, and the broadcast plan
  * shape of the scoring join. */
class QualityScorerSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  "qualityScorer" should "equal qualityScore over qualityModel of the labeled train split" in {
    val fused = QualityScorer.qualityScorer(docs, "doc_id", "text")
    // rebuild the fused query through the public split API: heuristic
    // labels from the stats() quality fold, model on the pmod(id,10)≠0
    // split only, then score everything against the frozen model
    val labeled = docs.join(
      TextStats.stats(docs, "doc_id", "text")
        .select(col("id").as("doc_id"),
          (col("quality_score") >= QualityScorer.QualityThreshold)
            .cast("int").as("hiq")),
      Seq("doc_id"))
    val model = QualityScorer.qualityModel(
      labeled.filter(pmod(col("doc_id"), lit(QualityScorer.HoldoutMod)) =!= 0),
      "doc_id", "text", "hiq")
    val split = QualityScorer.qualityScore(docs, "doc_id", "text", model)
    val common = split.columns.toSeq // fused minus label_hiq
    fused.select(common.map(col): _*).collect() shouldBe split.collect()
  }

  it should "label exactly the docs the p18 heuristic scores >= the threshold" in {
    val fromScorer = QualityScorer.labeled(docs, "doc_id", "text")
      .select(col("id"), col("hiq"))
    val fromStats = TextStats.stats(docs, "doc_id", "text")
      .select(col("id"),
        (col("quality_score") >= QualityScorer.QualityThreshold).cast("int").as("hiq"))
    fromScorer.orderBy("id").collect() shouldBe fromStats.orderBy("id").collect()
  }

  it should "be deterministic across runs" in {
    val a = QualityScorer.qualityScorer(docs, "doc_id", "text").collect()
    val b = QualityScorer.qualityScorer(docs, "doc_id", "text").collect()
    a shouldBe b
  }

  it should "predict both classes on the test corpus (non-degenerate model)" in {
    val preds = QualityScorer.qualityScorer(docs, "doc_id", "text")
      .groupBy("predicted_hiq").count().collect()
    preds.length shouldBe 2 // a scorer that says the same thing for every doc learned nothing
  }

  it should "broadcast the model onto the occurrence rows" in {
    val plan = QualityScorer.qualityScorer(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  "qualityScore" should "count unseen buckets as OOV abstentions" in {
    import spark.implicits._
    val train = Seq((1L, "alpha beta gamma", 1), (2L, "delta epsilon zeta", 0))
      .toDF("doc_id", "text", "hiq")
    val model = QualityScorer.qualityModel(train, "doc_id", "text", "hiq")
    // "omega" hashes to a bucket no train doc touched (verified below);
    // the other two tokens carry one vote each
    val scored = QualityScorer.qualityScore(
      Seq((9L, "alpha delta omega")).toDF("doc_id", "text"),
      "doc_id", "text", model).collect()(0)
    scored.getAs[Long]("n_tokens") shouldBe 3L
    scored.getAs[Long]("n_oov") shouldBe 1L
    scored.getAs[Long]("pos_votes") shouldBe 1L // alpha
    scored.getAs[Long]("neg_votes") shouldBe 1L // delta
  }

  "scorerEval" should "partition the holdout exactly into the confusion cells" in {
    val eval = QualityScorer.scorerEval(
      QualityScorer.qualityScorer(docs, "doc_id", "text")).collect()(0)
    val Seq(n, tp, fp, fn, tn) =
      Seq("n_holdout", "tp", "fp", "fn", "tn").map(eval.getAs[Long])
    (tp + fp + fn + tn) shouldBe n
    eval.getAs[Double]("accuracy") shouldBe (tp + tn).toDouble / n
    n shouldBe docs.filter(pmod(col("doc_id"), lit(10)) === 0).count()
  }

  "thresholdSweep" should "be monotone in threshold and agree with scorerEval at 0.5" in {
    val scored = QualityScorer.qualityScorer(docs, "doc_id", "text")
    val sweep = QualityScorer.thresholdSweep(scored).collect()
      .map(r => r.getAs[Double]("threshold") -> r).toMap
    sweep.size shouldBe QualityScorer.DefaultThresholds.size
    // keep counts shrink (weakly) as the bar rises; tp+fn (the labeled
    // positives) is threshold-invariant
    val byT = QualityScorer.DefaultThresholds.map(sweep)
    byT.map(_.getAs[Long]("n_keep")).sliding(2).foreach {
      case Seq(a, b) => a should be >= b
      case _ =>
    }
    byT.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).distinct.size shouldBe 1
    // the 0.5 row IS scorerEval's confusion matrix (predicted_hiq is
    // defined as nb_score >= 0.5)
    val eval = QualityScorer.scorerEval(scored).collect()(0)
    val at05 = sweep(0.5)
    Seq("tp", "fp", "fn", "tn").foreach { c =>
      at05.getAs[Long](c) shouldBe eval.getAs[Long](c)
    }
  }
}
