package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeLike}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Regression lock on the scale-critical plan shapes: the embedding
  * near-dup rewrite exists precisely so no exchange ever carries a vector
  * column — at 100 TB the difference between shuffling ids and shuffling
  * the embedding corpus ~8×. If a future edit reintroduces a vector-bearing
  * shuffle or broadcast on the banding side, this fails loudly.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  /** The real embeddings table: guaranteed to produce near-dup pairs at
    * the default threshold, so AQE cannot shortcut the final plan to an
    * EmptyRelation (which would leave nothing to audit). */
  private def embeddings =
    graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")

  /** Every node of the final adaptive plan — descending into query
    * stages, which `collect` treats as leaves. */
  private def allNodes(plan: SparkPlan): Seq[SparkPlan] = {
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(walk)
    }
    walk(plan)
  }

  /** All exchange nodes (shuffle + broadcast) in the final adaptive plan. */
  private def exchanges(plan: SparkPlan): Seq[Exchange] =
    allNodes(plan).collect { case e: Exchange => e }

  "nearDupPairs" should "score candidates at probe time — no unscored pair exchange" in {
    val df = Similarity.nearDupPairs(embeddings, "vec_id", "embedding")
    df.collect() // materialize so AQE settles the final plan
    val exs = exchanges(df.queryExecution.executedPlan)
    exs should not be empty
    // the round-15 shape (the simhash hamming-at-probe pattern): the
    // banding exchange MAY carry the vector — ~2 GB at 1M × dim 64, the
    // cheap side of the trade — but candidate PAIRS must never shuffle
    // unscored: the superseded candidate-distinct design materialized
    // Σ m² pair rows through an exchange (~1e9 rows / 80 GB spill at 1M
    // vectors, the round-15 rung failure). Every shuffle whose output
    // carries both pair ids must therefore already carry the cosine
    // score — scoring happened inside the self-join, before any pair
    // row left the probe task.
    val pairShuffles = exs.filter { e =>
      e.isInstanceOf[ShuffleExchangeLike] && {
        val names = e.child.output.map(_.name)
        names.contains("vec_a") && names.contains("vec_b")
      }
    }
    // the dedup (and sort) exchanges exist and are post-scoring: their
    // output must carry the SCORE specifically — `sim` itself, or the
    // dedup aggregate's partial first(sim) buffer — while the superseded
    // candidate-distinct exchange shuffled BARE (vec_a, vec_b) keys.
    // Requiring "some non-key payload" was too weak (round-16 advice):
    // a regression that shuffles unscored pairs still CARRYING the ea/eb
    // vectors — the same Σ m² blow-up with fatter rows — would have had
    // a payload column and passed. So: the payload must include a sim
    // column, and no pair exchange may carry a float-array (vector)
    // column at all.
    pairShuffles should not be empty
    pairShuffles.foreach { e =>
      val out = e.child.output
      withClue(s"pair exchange without a score column:\n$e\n") {
        // `sim` itself, or the dedup aggregate's partial first(sim)
        // buffer (attribute name: bare "first")
        out.map(_.name.toLowerCase)
          .exists(n => n.contains("sim") || n == "first") shouldBe true
      }
      withClue(s"pair exchange carrying a vector column:\n$e\n") {
        out.filter(_.dataType == ArrayType(FloatType, containsNull = true))
          .map(_.name) shouldBe empty
        out.filter(_.dataType == ArrayType(FloatType, containsNull = false))
          .map(_.name) shouldBe empty
      }
    }
  }

  "topK" should "plan as a k-bounded partial→final aggregate in every knn path" in {
    // the bounded heap aggregate is the whole point (round-5 verdict item
    // 3): each scan task must reduce to ≤k entries per query BEFORE the
    // shuffle. If a future edit regresses to collect_list-then-slice (no
    // partial TopKAgg) or loses the object-hash strategy, fail loudly.
    import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, ObjectHashAggregateExec}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
    val e = embeddings
    val paths = Seq(
      "brute" -> Similarity.knnBruteForce(e, "vec_id", "embedding", col("vec_id") < 5),
      "lsh" -> Similarity.knnLsh(e, "vec_id", "embedding", col("vec_id") < 5),
      "ivf" -> Similarity.knnIvf(e, "vec_id", "embedding", col("vec_id") < 5))
    paths.foreach { case (name, df) =>
      df.collect() // settle the adaptive plan
      val aggs = allNodes(df.queryExecution.executedPlan)
        .collect { case a: BaseAggregateExec => a }
      val topkModes = aggs.flatMap(_.aggregateExpressions)
        .filter(_.aggregateFunction.isInstanceOf[graft.functions.TopKAgg])
        .map(_.mode).toSet
      withClue(s"$name: topk agg modes: ") {
        topkModes should contain allOf (Partial, Final)
      }
      withClue(s"$name: object-hash strategy: ") {
        aggs.exists(_.isInstanceOf[ObjectHashAggregateExec]) shouldBe true
      }
    }
  }

  "lang_sample" should "plan its per-language top-k through the partial→final TopKAgg" in {
    // the stratified sampler reuses the k-bounded heap instead of a
    // per-language window sort — at corpus scale a window would funnel a
    // whole language through one task; the heap reduces map-side first.
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Final, Partial}
    val df = graft.ops.DocAnalytics.queries("p63_lang_sample")(spark, "/root/testdata/sf0.01")
    df.collect()
    val modes = allNodes(df.queryExecution.executedPlan)
      .collect { case a: BaseAggregateExec => a }
      .flatMap(_.aggregateExpressions)
      .filter(_.aggregateFunction.isInstanceOf[graft.functions.TopKAgg])
      .map(_.mode).toSet
    modes should contain allOf (Partial, Final)
  }

  "knnIvfPqRerank" should "re-rank without ever shuffling a vector column" in {
    // IVFADC+R's scale contract: the shortlist and query batch broadcast,
    // the corpus is streamed through BroadcastHashJoins — so the ONLY
    // exchanges allowed to carry array<float> are broadcasts (query
    // vectors ride the probe/query broadcast); a vector-bearing SHUFFLE
    // means the corpus started moving and the design is broken.
    val e = embeddings
    val cents = Similarity.lowestIdCentroids(e, "vec_id", "embedding", 8)
    val cb = ProductQuantizer.trainResidualCodebooks(
      e, "vec_id", "embedding", cents, m = 16)
    val df = ProductQuantizer.knnIvfPqRerank(e, "vec_id", "embedding",
      col("vec_id") < 5, cents, cb, kShort = 30, nProbe = 2)
    df.collect() // settle the adaptive plan
    val exs = exchanges(df.queryExecution.executedPlan)
    exs should not be empty
    val isVectorType: org.apache.spark.sql.types.DataType => Boolean = {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val vectorShuffles = exs.filter { e =>
      e.isInstanceOf[ShuffleExchangeLike] &&
        e.child.output.exists(a => isVectorType(a.dataType))
    }
    withClue(s"vector-carrying shuffles:\n${vectorShuffles.mkString("\n")}\n") {
      vectorShuffles shouldBe empty
    }
  }

  "nearDupPairs" should "agree with a brute-force cosine check on the planted near-dups" in {
    // two exact duplicates + near-dup planted among random vectors
    val base = Array.fill(64)(0.5f)
    val near = base.clone(); near(0) = 0.45f
    val rnd = new scala.util.Random(11)
    val rows = Seq((100L, base), (101L, base.clone), (102L, near)) ++
      (0L until 40L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(df, "vec_id", "embedding", minSim = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((100L, 101L))
    pairs should contain((100L, 102L))
  }
}
