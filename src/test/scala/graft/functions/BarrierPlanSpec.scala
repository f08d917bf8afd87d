package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LogicalPlan}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Regression lock on the compute-once plan shapes the text operators rely
  * on. [[Barrier.once]]'s guarantee rests on CollapseProject not crossing a
  * `Generate` node — true in current Spark, but nothing in the optimizer
  * contract promises it. If a future Spark version (or a new rule) learns
  * to collapse a single-element `explode(array(struct(…)))`, the expensive
  * array expressions (token hashes, shingle sets, signatures) silently go
  * back to being re-evaluated once per downstream reference — a perf
  * cliff, not a correctness bug, so only a plan assertion can catch it.
  * Same for the dedup self-joins' exchange reuse: both sides of the
  * candidate join must read ONE shingle/signature stage.
  */
class BarrierPlanSpec extends SparkSpec {

  private def docs: DataFrame =
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")

  private def generates(plan: LogicalPlan): Seq[Generate] =
    plan.collect { case g: Generate => g }

  /** All reused-exchange nodes in the final adaptive plan (descending into
    * query stages, which `collect` treats as leaves). */
  private def reusedExchanges(plan: SparkPlan): Seq[ReusedExchangeExec] = {
    def walk(p: SparkPlan): Seq[ReusedExchangeExec] = {
      val here = p match { case r: ReusedExchangeExec => Seq(r); case _ => Seq.empty }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(walk)
    }
    walk(plan)
  }

  behavior of "the Generate barrier"

  it should "survive optimization in exactDedup's plan" in {
    val plan = graft.text.TextDedup.exactDedup(docs, "doc_id", "text")
      .queryExecution.optimizedPlan
    generates(plan) should not be empty
  }

  it should "survive optimization in simhash's plan" in {
    val plan = graft.text.TextDedup.simhash(docs, "doc_id", "text")
      .queryExecution.optimizedPlan
    generates(plan) should not be empty
  }

  it should "survive optimization in TextStats.stats' plan" in {
    val plan = graft.text.TextStats.stats(docs, "doc_id", "text")
      .queryExecution.optimizedPlan
    // tokenFrame stacks two barriers (norm, then tokens) plus the counter
    // barrier — all three must survive or some column recomputes per ref
    generates(plan).size should be >= 3
  }

  it should "survive optimization in TextStats.fingerprint's plan" in {
    val plan = graft.text.TextStats.fingerprint(docs, "doc_id", "text")
      .queryExecution.optimizedPlan
    generates(plan).size should be >= 2
  }

  it should "survive optimization in TextCuration.piiScrub's plan" in {
    // one barrier stores norm; four count regexes + the four-deep
    // replacement chain all reference it — without the barrier the
    // normalize regex runs ~9x per row
    val plan = graft.text.TextCuration.piiScrub(docs, "doc_id", "text")
      .queryExecution.optimizedPlan
    generates(plan) should not be empty
  }

  it should "survive optimization in TextCuration.repetitionStats' plan" in {
    // r15: the six counters collapsed into ONE codegen expression
    // (CurationStats) whose child is the normalize chain, so a single
    // barrier suffices — it stores the counter STRUCT, which all four
    // ratio/keep outputs reference; without it the expression (and its
    // normalize child) would re-evaluate once per referencing column
    val plan = graft.text.TextCuration.repetitionStats(docs, "doc_id", "text")
      .queryExecution.optimizedPlan
    generates(plan).size should be >= 1
  }

  it should "survive optimization in TextCuration.hashSplit's plan" in {
    // norm barrier + hash barrier: bucket and split both read the stored h
    val plan = graft.text.TextCuration.hashSplit(docs, "doc_id", "text")
      .queryExecution.optimizedPlan
    generates(plan).size should be >= 2
  }

  behavior of "the dedup self-join exchanges"

  it should "compute the shingle stage once in ngramJaccardPairs (reused exchange)" in {
    val df = graft.text.TextDedup.ngramJaccardPairs(docs, "doc_id", "text", maxShingleDf = graft.text.TextDedup.MaxDf(0))
    df.collect() // settle the adaptive plan
    reusedExchanges(df.queryExecution.executedPlan) should not be empty
  }

  it should "compute the signature stage once in minhashNearDup (reused exchange)" in {
    val df = graft.text.TextDedup.minhashNearDup(docs, "doc_id", "text")
    df.collect()
    reusedExchanges(df.queryExecution.executedPlan) should not be empty
  }
}
