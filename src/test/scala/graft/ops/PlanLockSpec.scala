package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}

/** Plan locks for the interval-join and decontamination operators: the
  * scale claims in their scaladocs (no theta-join explosion, broadcast
  * direction) asserted against the EXECUTED (AQE-final) plan so a
  * refactor can't silently regress them. */
class PlanLockSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Execute and return every physical node, descending through AQE's
    * stage wrappers (collect treats them as leaves otherwise). */
  private def executedNodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => Seq(other)
    }.flatten
    walk(df.queryExecution.executedPlan)
  }

  "occupancyAsOf (p44)" should "run join-free — pure union + window" in {
    val nodes = executedNodes(ParkingAnalytics.occupancyAsOf(spark, sfDir))
    nodes.count {
      case _: SortMergeJoinExec | _: BroadcastHashJoinExec |
           _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
  }

  "eventSessionAttribution (p45)" should "plan the containment as an equi-join, never a theta join" in {
    val nodes = executedNodes(ParkingAnalytics.eventSessionAttribution(spark, sfDir))
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    nodes.count {
      case _: SortMergeJoinExec | _: BroadcastHashJoinExec => true
      case _ => false
    } should be >= 1
  }

  "surprisalBuckets (p139)" should "broadcast the context counts and the per-language tertiles, never a theta join" in {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val nodes = executedNodes(graft.text.TextStats.surprisalBuckets(
      docs, "doc_id", "text", "lang"))
    // c1 (≤ B rows) and thr (≤ C langs) ride explicit broadcast()s; the
    // langs join back onto scored docs may be either join family
    nodes.count { case _: BroadcastHashJoinExec => true; case _ => false } should be >= 2
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
  }

  "soleLateSuppliers (p156)" should "plan the EXISTS/NOT EXISTS as equi semi/anti joins, never a theta join" in {
    import org.apache.spark.sql.catalyst.plans.{LeftSemi, LeftAnti}
    val nodes = executedNodes(RelAnalytics.soleLateSuppliers(spark, sfDir))
    // the different-supplier predicate must ride the l_orderkey equi-join
    // as a residual condition, not force a nested-loop
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    val joinTypes = nodes.collect {
      case j: SortMergeJoinExec => j.joinType
      case j: BroadcastHashJoinExec => j.joinType
    }
    joinTypes.count(_ == LeftSemi) should be >= 1
    joinTypes.count(_ == LeftAnti) should be >= 1
  }

  "dormantHighValue (p157)" should "push the dormancy cutoff to the orders scan and anti-join it" in {
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    val df = RelAnalytics.dormantHighValue(spark, sfDir)
    val nodes = executedNodes(df)
    nodes.collect {
      case j: SortMergeJoinExec => j.joinType
      case j: BroadcastHashJoinExec => j.joinType
    }.count(_ == LeftAnti) should be >= 1
    // the date filter reaches parquet: the orders scan is pruned before
    // the anti join probes it
    df.queryExecution.executedPlan.toString should
      include("GreaterThanOrEqual(o_orderdate")
  }

  "minCostSupplier (p165)" should "broadcast the geography dimension and never theta-join the lattice" in {
    val nodes = executedNodes(RelAnalytics.minCostSupplier(spark, sfDir))
    // the correlated min decorrelates into equi joins on (partkey) and
    // (partkey, cost) — a theta/nested-loop here would be the quadratic
    // lattice blow-up the decorrelated statement exists to avoid
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    // nation⋈region rides the explicit broadcast
    nodes.count { case _: BroadcastHashJoinExec => true; case _ => false } should be >= 1
  }

  "promoVolumeSuppliers (p166)" should "plan the nested IN/EXISTS as equi semi joins, never a theta join" in {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val nodes = executedNodes(RelAnalytics.promoVolumeSuppliers(spark, sfDir))
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    // three stated semi joins: the finished-order gate, the promo-part
    // filter, and the supplier eligibility probe
    nodes.collect {
      case j: SortMergeJoinExec => j.joinType
      case j: BroadcastHashJoinExec => j.joinType
    }.count(_ == LeftSemi) should be >= 3
  }

  "bigQuantityOrders (p169)" should "plan the HAVING gate as equi joins, never a theta join" in {
    val nodes = executedNodes(RelAnalytics.bigQuantityOrders(spark, sfDir))
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    nodes.count {
      case _: SortMergeJoinExec | _: BroadcastHashJoinExec => true
      case _ => false
    } should be >= 2
  }

  "supplierRelationshipCount (p170)" should "anti-join the flagged suppliers via broadcast, never a theta join" in {
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    // sf0.01, not the usual sf0.001: the smallest testdata has NO
    // negative-balance supplier, so AQE empty-relation propagation
    // eliminates the anti join outright and there is no node to pin
    val nodes = executedNodes(
      RelAnalytics.supplierRelationshipCount(spark, "/root/testdata/sf0.01"))
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    nodes.collect {
      case j: BroadcastHashJoinExec => j.joinType
    }.count(_ == LeftAnti) should be >= 1
  }

  "importantParts (p171)" should "semi-join the nation's suppliers and broadcast the 1-row scalar gate" in {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val nodes = executedNodes(RelAnalytics.importantParts(spark, sfDir))
    // the scalar total is the only nested-loop-family node allowed: a
    // 1-row explicit broadcast (the p157 scalar-subquery pattern)
    nodes.count { case _: CartesianProductExec => true; case _ => false } shouldBe 0
    nodes.count {
      case _: BroadcastNestedLoopJoinExec => true
      case _ => false
    } should be <= 1
    nodes.collect {
      case j: SortMergeJoinExec => j.joinType
      case j: BroadcastHashJoinExec => j.joinType
    }.count(_ == LeftSemi) should be >= 1
  }

  "orderPriorityCheck (p172)" should "plan the correlated EXISTS as an equi semi join with a residual, never a theta join" in {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val df = RelAnalytics.orderPriorityCheck(spark, sfDir)
    val nodes = executedNodes(df)
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    nodes.collect {
      case j: SortMergeJoinExec => j.joinType
      case j: BroadcastHashJoinExec => j.joinType
    }.count(_ == LeftSemi) should be >= 1
    // the quarter filter reaches the orders parquet scan
    df.queryExecution.executedPlan.toString should
      include("GreaterThanOrEqual(o_orderdate")
  }

  "disjunctiveRevenue (p174)" should "push the implied per-side filters and keep ONE equi join" in {
    val df = RelAnalytics.disjunctiveRevenue(spark, sfDir)
    val nodes = executedNodes(df)
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    nodes.count {
      case _: SortMergeJoinExec | _: BroadcastHashJoinExec => true
      case _ => false
    } shouldBe 1
    // Catalyst's implied-disjunction split: the brand disjunction reaches
    // the part scan as a pushed filter (Or(EqualTo(p_brand, ...)) — small
    // lists stay ORs below the IN-conversion threshold), and the quantity
    // range union reaches the lineitem filter
    val planStr = df.queryExecution.executedPlan.toString
    planStr should include("EqualTo(p_brand,Brand#12)")
    planStr should include regex "Filter .*l_quantity"
  }

  /** Full PushedFilters text across every parquet scan of the EXECUTED
    * plan — plan.toString elides long filter lists past
    * spark.sql.maxMetadataStringLength, so the earlier locks' substring-
    * on-toString idiom silently can't see late list entries. */
  private def pushedFilters(df: DataFrame): String =
    executedNodes(df).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "")
    }.mkString("; ")

  "forecastRevenue (p175)" should "run join-free with all three predicates pushed to the scan" in {
    val df = RelAnalytics.forecastRevenue(spark, sfDir)
    val nodes = executedNodes(df)
    nodes.count {
      case _: SortMergeJoinExec | _: BroadcastHashJoinExec |
           _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    val pf = pushedFilters(df)
    pf should include("GreaterThanOrEqual(l_shipdate")
    pf should include("GreaterThanOrEqual(l_discount")
    pf should include("LessThan(l_quantity")
  }

  "volumeShipping (p176)" should "prune both fact sides through broadcast dimension joins, never a theta join" in {
    // sf0.01 (the p170 convention): at sf0.001 the nation-pair slice
    // matches no cross-nation order, and AQE's empty-relation propagation
    // eliminates every join, leaving no node to pin
    val df = RelAnalytics.volumeShipping(spark, "/root/testdata/sf0.01")
    val nodes = executedNodes(df)
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    // the nation-pair slices ride explicit broadcasts into supplier and
    // customer before either touches a fact
    nodes.count { case _: BroadcastHashJoinExec => true; case _ => false } should be >= 2
    pushedFilters(df) should include("GreaterThanOrEqual(l_shipdate")
  }

  "nationMarketShare (p177)" should "semi-join the two dimension filters onto the fact, never a theta join" in {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val df = RelAnalytics.nationMarketShare(spark, sfDir)
    val nodes = executedNodes(df)
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    // the STANDARD-part and ASIA-customer gates are stated semi joins
    nodes.collect {
      case j: SortMergeJoinExec => j.joinType
      case j: BroadcastHashJoinExec => j.joinType
    }.count(_ == LeftSemi) should be >= 2
    pushedFilters(df) should include("GreaterThanOrEqual(o_orderdate")
  }

  "productTypeProfit (p178)" should "push the name filter to the part scan, never a theta join" in {
    val df = RelAnalytics.productTypeProfit(spark, sfDir)
    val nodes = executedNodes(df)
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    // contains() reaches parquet as StringContains
    pushedFilters(df) should include("StringContains(p_name,gear)")
  }

  "returnedItemReport (p179)" should "push both fact filters and plan the top-20 as TakeOrdered" in {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val df = RelAnalytics.returnedItemReport(spark, sfDir)
    val nodes = executedNodes(df)
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    nodes.count {
      case _: TakeOrderedAndProjectExec => true
      case _ => false
    } should be >= 1
    val pf = pushedFilters(df)
    pf should include("GreaterThanOrEqual(o_orderdate")
    pf should include("EqualTo(l_returnflag,R)")
  }

  "customerOrderDistribution (p180)" should "keep the outer join and chain two partial-aggregated rollups" in {
    import org.apache.spark.sql.catalyst.plans.LeftOuter
    val nodes = executedNodes(
      RelAnalytics.customerOrderDistribution(spark, sfDir))
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
    nodes.collect {
      case j: SortMergeJoinExec => j.joinType
      case j: BroadcastHashJoinExec => j.joinType
    }.count(_ == LeftOuter) should be >= 1
  }

  "topSupplier (p181)" should "broadcast only the 1-row max over the rollup — no view self-join" in {
    val df = RelAnalytics.topSupplier(spark, sfDir)
    val nodes = executedNodes(df)
    nodes.count { case _: CartesianProductExec => true; case _ => false } shouldBe 0
    // the global max rides the p171/p157 1-row-broadcast pattern; that
    // single BNLJ is the only nested-loop-family node allowed
    nodes.count {
      case _: BroadcastNestedLoopJoinExec => true
      case _ => false
    } should be <= 1
    pushedFilters(df) should include("GreaterThanOrEqual(l_shipdate")
  }

  "contamination (p42)" should "broadcast the benchmark gram vocabulary" in {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val nodes = executedNodes(graft.text.TextCuration.contamination(
      docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25), "doc_id", "text"))
    nodes.count { case _: BroadcastHashJoinExec => true; case _ => false } should be >= 1
    nodes.count {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
      case _ => false
    } shouldBe 0
  }
}
