package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Star-schema relational analytics over the TPC-H-shaped tables
  * (lineitem/orders/customer/supplier/part/nation/region) — the classic
  * warehouse query patterns a general-purpose engine must run well:
  * scan-heavy group-aggregation (p68), selective multi-way join with
  * top-k (p69), a five-table star join with bounded-dimension broadcasts
  * (p70), and conditional aggregation over a dimension attribute (p71).
  *
  * Plan discipline (audited via .explain): date/segment filters sit
  * directly on the scans (parquet PushedFilters), only referenced columns
  * are read (ReadSchema), every aggregate runs map-side partial before
  * its shuffle, and the only broadcast HINTS are the dimensions bounded
  * by construction (nation/region — world geography, not data scale);
  * customer/supplier/part grow with the corpus, so their join strategy is
  * left to size-based planning (AQE broadcasts them at bench scale and
  * shuffles them at 100 TB, both correctly).
  *
  * Money math is EXACT-INTEGER by design: the generated prices/discounts
  * are 2-decimal, so every monetary expression is computed in integer
  * cents (× 10⁴ for discounted, × 10⁶ for taxed units) and summed
  * exactly — summation order cannot perturb the result, which is what
  * lets the DuckDB oracle compare the final doubles bit-for-bit after
  * the single closing division. Long sums hold to ~sf100 for the taxed
  * units (≈7e10/row × row count); beyond that the same expressions sum
  * as decimal(38,0) unchanged — p68's charge column already does, as the
  * template.
  */
object RelAnalytics {

  /** round-half-up 2-decimal double → exact integer cents. */
  private def cents(c: Column): Column = round(c * 100).cast("long")
  /** discount/tax percentage points as exact integers. */
  private def pct(c: Column): Column = round(c * 100).cast("long")

  /** extendedprice·(1−discount) in 10⁻⁴-dollar units — exact. */
  private def discUnits(ep: Column, d: Column): Column =
    cents(ep) * (lit(100L) - pct(d))

  private def asDollars4(sum: Column): Column =
    sum.cast("double") / lit(10000.0)

  /** p68 — Q1-shaped pricing summary: one scan-heavy pass over lineitem
    * with a pushed date filter; all eight aggregates ride one map-side
    * partial aggregation on a 6-ary group key. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
    val chargeUnits = // ep·(1−d)·(1+t) in 10⁻⁶ units; decimal(38,0) sum —
      // the overflow-proof template for the largest scale factors
      (discUnits(col("l_extendedprice"), col("l_discount"))
        * (lit(100L) + pct(col("l_tax")))).cast("decimal(38,0)")
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("base_cents"),
        sum(discUnits(col("l_extendedprice"), col("l_discount"))).as("disc_units"),
        sum(chargeUnits).as("charge_units"),
        sum(pct(col("l_discount"))).as("disc_pct_sum"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        (col("base_cents").cast("double") / lit(100.0)).as("sum_base_price"),
        asDollars4(col("disc_units")).as("sum_disc_price"),
        (col("charge_units").cast("double") / lit(1000000.0)).as("sum_charge"),
        (col("sum_qty").cast("double") / col("count_order").cast("double")).as("avg_qty"),
        (col("base_cents").cast("double") / lit(100.0)
          / col("count_order").cast("double")).as("avg_price"),
        (col("disc_pct_sum").cast("double") / lit(100.0)
          / col("count_order").cast("double")).as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** p69 — Q3-shaped: top-10 highest-revenue urgent orders for one market
    * segment, not yet shipped at the cutoff. The segment and date filters
    * push to the scans; the final top-k plans as TakeOrderedAndProject
    * (never a global sort of the aggregate). */
  def topOrders(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-01-01").cast("timestamp")
    val c = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        discUnits(col("l_extendedprice"), col("l_discount")).as("rev_units"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(col("rev_units")).as("rev_units"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        asDollars4(col("rev_units")).as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  /** p70 — Q5-shaped: revenue per nation in one region from LOCAL
    * suppliers (customer and supplier share the nation). nation/region
    * are broadcast by hint (bounded by construction); customer/supplier
    * join strategy stays size-based. */
  def nationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_suppkey"),
      discUnits(col("l_extendedprice"), col("l_discount")).as("rev_units"))
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val n = broadcast(Tables.nation(spark, dir)
      .select("n_nationkey", "n_name", "n_regionkey"))
    val r = broadcast(Tables.region(spark, dir)
      .filter(col("r_name") === "ASIA").select("r_regionkey"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(col("rev_units")).as("rev_units"))
      .select(col("n_name"), asDollars4(col("rev_units")).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** p71 — Q14-shaped: promotional revenue share for one ship year —
    * conditional aggregation over a joined dimension attribute; the share
    * is one division of two exactly-summed integers. */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .select(col("l_partkey"),
        discUnits(col("l_extendedprice"), col("l_discount")).as("rev_units"))
    val p = Tables.part(spark, dir).select("p_partkey", "p_type")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev_units")).otherwise(0L))
          .as("promo_units"),
        sum(col("rev_units")).as("total_units"))
      .select(
        asDollars4(col("promo_units")).as("promo_revenue"),
        asDollars4(col("total_units")).as("total_revenue"),
        (col("promo_units").cast("double") / col("total_units").cast("double"))
          .as("promo_share"))
  }

  /** p74 — Q17-shaped: revenue from below-average-quantity line items,
    * i.e. the correlated scalar subquery `qty < 0.2·avg(qty per part)`
    * in its DECORRELATED form — one per-part aggregate joined back to
    * the fact (the plan Catalyst rewrites such subqueries into anyway;
    * stating it as agg+join keeps it explicit and co-partitioned: both
    * sides shuffle once on l_partkey). The threshold is computed in the
    * same expression order on both engines; the aggregate sums stay
    * exact integers. */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(
      col("l_partkey"), col("l_quantity").cast("long").as("qty"),
      cents(col("l_extendedprice")).as("ep"))
    val perPart = l.groupBy("l_partkey")
      .agg(sum(col("qty")).as("sq"), count(lit(1)).as("cnt"))
    l.join(perPart, "l_partkey")
      .filter(col("qty").cast("double") <
        lit(0.2) * (col("sq").cast("double") / col("cnt").cast("double")))
      .agg(count(lit(1)).as("n_small_rows"), sum(col("ep")).as("ep_sum"))
      .select(col("n_small_rows"),
        (col("ep_sum").cast("double") / lit(100.0)).as("small_revenue"))
  }

  /** p75 — FULL OUTER reconciliation: per-plate entry vs exit counts over
    * the events table, keeping plates that appear on either side only
    * (the audit query every ledger-ish pipeline runs). Exercises the one
    * outer-join shape the surface lacked; both sides pre-aggregate before
    * the join, so the outer join matches one row per plate per side. */
  def entryExitReconciliation(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.schema.ParkingModel.parkingEvents(spark, dir)
    def side(kind: String, as: String) =
      ev.filter(col("eventType") === kind)
        .groupBy(col("licensePlate").as("plate"))
        .agg(count(lit(1)).as(as))
    side("PARKING_ENTRY", "n_entries")
      .join(side("PARKING_EXIT", "n_exits"), Seq("plate"), "full_outer")
      .select(col("plate"),
        coalesce(col("n_entries"), lit(0L)).as("n_entries"),
        coalesce(col("n_exits"), lit(0L)).as("n_exits"))
      .withColumn("diff", col("n_entries") - col("n_exits"))
      .orderBy("plate")
  }

  /** p156 — Q21-shaped: suppliers who were the SOLE late supplier on a
    * finished multi-supplier order ("late" = shipped > 365 days after the
    * order date — the schema's delivery-commitment proxy). The classic
    * correlated EXISTS / NOT EXISTS pair, stated as the fact-scale
    * LEFT SEMI + LEFT ANTI self-joins Catalyst decorrelates it into:
    * all three legs (candidates, the co-supplier probe, the co-late
    * probe) shuffle ONCE on l_orderkey and stay co-partitioned, the
    * different-supplier predicate rides the joins as a residual
    * condition, and the supplier NAME dimension joins after the
    * per-supplier rollup (C rows, size-based broadcast). numwait counts
    * candidate ROWS, the Q21 convention. */
  def soleLateSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 365 DAYS"))
          .as("late"))
    val l1 = l.filter(col("late"))
    val others = l.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val lateOthers = l1.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    val s = Tables.supplier(spark, dir).select("s_suppkey", "s_name")
    l1.join(others,
        col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
        "left_semi")
      .join(lateOthers,
        col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"),
        "left_anti")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(10)
  }

  /** p157 — Q22-shaped: high-balance customers gone DORMANT (no order
    * since the cutoff), per nation — the scalar-subquery-filter + anti
    * join decorrelation showcase. The positive-balance average is a
    * 1-row broadcast (sum/count in exact integer cents, ONE double
    * division); dormancy is a LEFT ANTI against the date-pruned orders
    * scan (the predicate pushes to parquet, so the anti join probes only
    * the post-cutoff slice); the per-nation rollup sums exact cents. */
  def dormantHighValue(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2000-06-01").cast("timestamp")
    val c = Tables.customer(spark, dir).select(
      col("c_custkey"), col("c_nationkey"), cents(col("c_acctbal")).as("bal_cents"))
    val avgRow = c.filter(col("bal_cents") > 0)
      .agg(sum(col("bal_cents")).as("s"), count(lit(1)).as("n"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= cutoff).select("o_custkey")
    c.crossJoin(broadcast(avgRow))
      .filter(col("bal_cents").cast("double") >
        col("s").cast("double") / col("n").cast("double"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_custs"), sum(col("bal_cents")).as("bal_sum"))
      .select(col("c_nationkey"), col("n_custs"),
        (col("bal_sum").cast("double") / lit(100.0)).as("total_acctbal"))
      .orderBy("c_nationkey")
  }

  /** p165 — Q2-shaped: the min-cost supplier per part against a
    * dimension lattice. The schema ships no partsupp, so the supply
    * lattice is DERIVED from the fact: per (part, supplier), the
    * minimum total line price ever quoted (exact integer cents) — one
    * partkey-partitioned aggregate over lineitem. The classic correlated
    * min-subquery ("cost = the minimum cost any EUROPE supplier quotes
    * for this part") runs in its decorrelated form: a per-part min over
    * the region-filtered lattice, joined back on (partkey, cost) — both
    * aggregates and the join-back shuffle ONCE on l_partkey and stay
    * co-partitioned. nation⋈region is an explicit broadcast (world
    * geography, bounded by construction); the part filter pushes to the
    * parquet scan and prunes the lattice through a semi-ish inner join
    * BEFORE the min aggregate (restricting to filtered parts first
    * cannot change a per-part min). Ordered s_acctbal DESC with full
    * tiebreak, top 100 — the Q2 output convention. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val euroNations = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select("n_nationkey", "n_name")
    val eur = Tables.supplier(spark, dir)
      .join(broadcast(euroNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val wantedParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO" && col("p_size") <= 15)
      .select("p_partkey", "p_name")
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        cents(col("l_extendedprice")).as("c"))
      .groupBy("l_partkey", "l_suppkey").agg(min(col("c")).as("cost_cents"))
      .join(wantedParts, col("l_partkey") === col("p_partkey"))
      .join(eur, col("l_suppkey") === col("s_suppkey"))
    // the correlated min as a per-part WINDOW over the lattice, not a
    // separate aggregate joined back: the aggregate+self-join form
    // re-derived the whole lattice subtree (fact aggregate + both
    // dimension joins — 20 parquet scans in the submitted plan) for the
    // min side, because the two consumers sit on branches exchange reuse
    // cannot unify. The window computes the identical per-part min (rows
    // tied at the min survive either way) over ONE lattice computation,
    // for one extra hash(l_partkey) exchange; per-part partitions are
    // bounded by suppliers-per-part, so the window never funnels.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
    ps.withColumn("min_cost", min(col("cost_cents")).over(w))
      .filter(col("cost_cents") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"),
        (col("cost_cents").cast("double") / lit(100.0)).as("supply_cost"))
      .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** p166 — Q20-shaped: the nested EXISTS-in-IN over TWO fact tables.
    * Suppliers who, for some promo-type part, shipped MORE under
    * finished orders than an EIGHTH of that part's total shipped
    * quantity — Q20's "availqty > a fixed share of demand" gate with the
    * derived lattice standing in for partsupp (the generator spreads
    * each part over many suppliers, so Q20's literal one-half share is
    * unreachable; 1/8 bites at both gate scales — 4 resp. 11 suppliers —
    * without changing the plan shape). Stated as Catalyst's own
    * decorrelation: the promo-part filter is a broadcast semi join onto
    * the fact, the finished-order gate a semi join on l_orderkey
    * (fact-to-fact, shuffled once), the per-(supplier, part) and
    * per-part sums co-partition on l_partkey, and the threshold compare
    * is integer (8·sq > total — quantities are integral). The supplier
    * dimension joins LAST, against the deduped eligible-key set. */
  def promoVolumeSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"))
    val total = l.groupBy("l_partkey").agg(sum(col("qty")).as("total_qty"))
    val promoParts = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select("p_partkey")
    val fin = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val sp = l
      .join(fin, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(promoParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_suppkey", "l_partkey").agg(sum(col("qty")).as("sq"))
    val elig = sp.join(total, "l_partkey")
      .filter(lit(8L) * col("sq") > col("total_qty"))
      .select("l_suppkey").distinct()
    Tables.supplier(spark, dir)
      .join(elig, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"))
      .orderBy("s_name")
  }

  /** p169 — Q18-shaped large-volume orders: the IN-with-HAVING over the
    * fact table ("orders whose line quantities sum past 300"), stated as
    * its decorrelation — the per-order quantity rollup IS the gate
    * (filter after one orderkey-partitioned aggregate), and the
    * surviving keys (post-HAVING, tiny) drive size-based joins back to
    * orders and customer; AQE broadcasts the gate side at every scale
    * because HAVING > 300 keeps ~0.3% of orders. The quantity sum is
    * integral, totalprice converts through exact cents. Top 100 by
    * totalprice — the Q18 output convention. */
  def bigQuantityOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      .groupBy("l_orderkey").agg(sum(col("qty")).as("sum_qty"))
      .filter(col("sum_qty") > 300L)
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        (cents(col("o_totalprice")).cast("double") / lit(100.0))
          .as("o_totalprice"),
        col("sum_qty"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(100)
  }

  /** p170 — Q16-shaped supplier-relationship count: distinct suppliers
    * per (p_type, p_size) over the derived supply lattice, EXCLUDING
    * flagged suppliers (negative account balance — the schema's stand-in
    * for Q16's complaint filter) via NOT IN. Decorrelation: the flagged
    * set is a broadcast LEFT ANTI onto the deduped lattice (bounded — a
    * fraction of the supplier dimension), the lattice dedup and the part
    * join co-partition on l_partkey, and the count-distinct rides the
    * (p_type, p_size) rollup. */
  def supplierRelationshipCount(spark: SparkSession, dir: String): DataFrame = {
    val flagged = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val lattice = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(flagged), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
    lattice
      .join(Tables.part(spark, dir).filter(col("p_size") <= 25)
          .select("p_partkey", "p_type", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_type"), col("p_size"))
  }

  /** p171 — Q11-shaped important parts: the value carried per part by
    * ONE nation's suppliers, kept when it exceeds a GLOBAL threshold —
    * the group-by-with-scalar-HAVING decorrelation (Q11's fraction is
    * scale-dependent, so the gate here is scale-free: part value > 3×
    * the mean part value, an EXACT integer compare value·n > 3·total —
    * no division touches the gate). The nation's supplier keys prune the
    * fact through a semi join before the partkey rollup; the global
    * total is a 1-row broadcast over the rollup itself (the p157 scalar
    * pattern), so the fact scans once. */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.supplier(spark, dir)
      .filter(col("s_nationkey") === 3).select("s_suppkey")
    val value = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        cents(col("l_extendedprice")).as("v"))
      .join(natSupp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey").agg(sum(col("v")).as("value_cents"))
    val total = value.agg(sum(col("value_cents")).as("tot"),
      count(lit(1)).as("n"))
    value.crossJoin(broadcast(total))
      .filter(col("value_cents") * col("n") > lit(3L) * col("tot"))
      .select(col("l_partkey"),
        (col("value_cents").cast("double") / lit(100.0)).as("part_value"))
      .orderBy(desc("part_value"), col("l_partkey"))
  }

  /** p172 — Q4-shaped order-priority check: orders placed in one quarter
    * with AT LEAST ONE late line (shipped > 90 days after the order date
    * — the schema's commit-date proxy, the p156 convention), counted per
    * priority. The correlated EXISTS references BOTH tables, so its
    * decorrelation is a LEFT SEMI on l_orderkey with the lateness
    * predicate riding the join as a residual condition; the quarter
    * filter pushes to the orders scan and prunes the probe side before
    * the join. */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    o.join(l,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** p173 — Q12-shaped priority split per line class: for one ship
    * year, per returnflag (the schema's shipmode stand-in), how many
    * lines belong to critical- vs normal-priority orders — the
    * fact-to-fact orderkey join feeding a two-way conditional count.
    * The date filter pushes to the lineitem scan; both conditional sums
    * ride one map-side partial aggregation. */
  def priorityShipSplit(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_returnflag")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** p174 — Q19-shaped disjunctive revenue: an OR of brand × quantity-
    * range conjunctions across the lineitem⋈part join. The plan point:
    * Catalyst splits the disjunction into per-side implied filters
    * (quantity ∈ [1,30] pushes to the lineitem scan, the brand IN-list
    * to the part scan) while the full OR evaluates as the join's
    * residual — one equi join, no union-of-three-plans blow-up. Revenue
    * sums exact integer units. */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(
      col("l_partkey"), col("l_quantity").cast("long").as("qty"),
      discUnits(col("l_extendedprice"), col("l_discount")).as("rev_units"))
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("qty").between(1L, 11L)) ||
        (col("p_brand") === "Brand#23" && col("qty").between(10L, 20L)) ||
        (col("p_brand") === "Brand#34" && col("qty").between(20L, 30L)))
      .agg(count(lit(1)).as("n_lines"),
        asDollars4(sum(col("rev_units"))).as("revenue"))
  }

  /** p175 — Q6-shaped forecasting revenue change: the purest scan query
    * in the suite — no join at all, three pushable predicates (ship
    * year, discount band, quantity cap) straight onto the parquet scan,
    * one global aggregate. The plan IS the test: FileScan with all three
    * PushedFilters, a 2-column ReadSchema... plus one partial→final agg;
    * anything more is a regression. Revenue = Σ ep·d in exact 10⁻⁴-
    * dollar units (cents × discount points). */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24.0)
      .agg(count(lit(1)).as("n_lines"),
        (sum(cents(col("l_extendedprice")) * pct(col("l_discount")))
          .cast("double") / lit(10000.0)).as("revenue"))
  }

  /** p176 — Q7-shaped volume shipping: revenue flowing between TWO named
    * nations per ship year — the join-order-sensitivity test. The two
    * 1-nation dimension slices prune supplier and customer BEFORE either
    * touches a fact (broadcast semi-shaped inner joins: supplier and the
    * nation pair are bounded), so the big lineitem⋈orders join runs over
    * pre-filtered keys; the cross-pair predicate (N1→N2 or N2→N1) rides
    * after both dimension attachments as a residual. Year extraction
    * stays post-filter (never in a pushed predicate). */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val pair = broadcast(Tables.nation(spark, dir)
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select("n_nationkey", "n_name"))
    val s = Tables.supplier(spark, dir)
      .join(pair, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val c = Tables.customer(spark, dir)
      .join(pair, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        discUnits(col("l_extendedprice"), col("l_discount")).as("rev_units"))
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(col("rev_units")).as("rev_units"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        asDollars4(col("rev_units")).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** p177 — Q8-shaped national market share: of the STANDARD-part volume
    * sold to one region's customers over two order years, the fraction
    * supplied by ONE nation — the two-sided-dimension-filter shape
    * (customer side restricted by region, part side by type, supplier
    * side merely LABELED). The share divides two exactly-summed integer
    * unit totals once per year row; the supplier nation label joins
    * through the broadcast-bounded nation table. */
  def nationMarketShare(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val c = Tables.customer(spark, dir)
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"),
        "left_semi")
      .select("c_custkey")
    val p = Tables.part(spark, dir).filter(col("p_type") === "STANDARD")
      .select("p_partkey")
    val sn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val l = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      discUnits(col("l_extendedprice"), col("l_discount")).as("vol_units"))
    l.join(p, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(sn, col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === "NATION_7", col("vol_units"))
          .otherwise(0L)).as("nat_units"),
        sum(col("vol_units")).as("tot_units"))
      .select(col("o_year"),
        asDollars4(col("nat_units")).as("nation_volume"),
        asDollars4(col("tot_units")).as("total_volume"),
        (col("nat_units").cast("double") / col("tot_units").cast("double"))
          .as("mkt_share"))
      .orderBy("o_year")
  }

  /** p178 — Q9-shaped product-type profit: per supplier nation per order
    * year, profit on parts whose name contains one token. The schema
    * ships no partsupp, so unit cost is the deterministic stand-in
    * 60% of p_retailprice — profit = ep·(1−d) − 0.6·retail·qty, every
    * term in exact 10⁻⁴-dollar units (cents·60·qty). The name filter is
    * a pushable `contains`; it prunes the part dimension BEFORE the fact
    * join (a broadcast at bench scale, a shuffle at 100 TB — size-based
    * either way); nation is the only hinted broadcast. */
  def productTypeProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_name").contains("gear"))
      .select(col("p_partkey"), cents(col("p_retailprice")).as("retail_cents"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
    val sn = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "nation")
    val l = Tables.lineitem(spark, dir).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_quantity").cast("long").as("qty"),
      discUnits(col("l_extendedprice"), col("l_discount")).as("rev_units"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(sn, col("l_suppkey") === col("s_suppkey"))
      .groupBy("nation", "o_year")
      .agg(sum(col("rev_units") - col("retail_cents") * col("qty") * lit(60L))
        .as("profit_units"))
      .select(col("nation"), col("o_year"),
        asDollars4(col("profit_units")).as("sum_profit"))
      .orderBy(col("nation"), desc("o_year"))
  }

  /** p179 — Q10-shaped returned-item reporting: the top-20 customers by
    * revenue on RETURNED lines for one order quarter — the classic
    * "who should sales call" query. Both fact filters push to their
    * scans (quarter → orders, returnflag → lineitem); the customer
    * rollup groups by the full display tuple (key, name, balance,
    * nation) so the aggregate emits report rows directly; top-20 plans
    * as TakeOrderedAndProject. */
  def returnedItemReport(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        discUnits(col("l_extendedprice"), col("l_discount")).as("rev_units"))
    val c = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey").as("cn_key"), col("n_name"))),
        col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(col("rev_units")).as("rev_units"))
      .select(col("c_custkey"), col("c_name"),
        asDollars4(col("rev_units")).as("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  /** p180 — Q13-shaped customer order-count distribution: how many
    * customers placed exactly k qualifying orders, INCLUDING k = 0 —
    * the suite's one left-outer-join-into-histogram shape. The order
    * filter (priority actually specified — the schema's stand-in for
    * Q13's comment NOT LIKE) applies BEFORE the outer join, so
    * non-matching customers survive with a null key and count(o_orderkey)
    * = 0; two aggregates chain (custkey rollup → count histogram), each
    * with map-side partials. */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select("o_orderkey", "o_custkey")
    Tables.customer(spark, dir).select("c_custkey")
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  /** p181 — Q15-shaped top supplier: the max-over-view shape — every
    * supplier's revenue for one ship quarter, keeping the row(s) equal
    * to the global maximum. The max is a 1-row broadcast over the
    * rollup itself (the p171/p157 scalar pattern: the fact scans once,
    * no self-join of the view), and the equality compares EXACT integer
    * units — the reason Q15's notorious "max over doubles misses by
    * 1 ulp" trap cannot fire here. Supplier name joins after the gate. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(discUnits(col("l_extendedprice"), col("l_discount")))
        .as("total_units"))
    val mx = rev.agg(max(col("total_units")).as("m"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_units") === col("m"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        asDollars4(col("total_units")).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p68_pricing_summary" -> (pricingSummary _),
    "p69_top_orders" -> (topOrders _),
    "p70_nation_revenue" -> (nationRevenue _),
    "p71_promo_share" -> (promoShare _),
    "p74_small_qty_revenue" -> (smallQuantityRevenue _),
    "p75_entry_exit_reconciliation" -> (entryExitReconciliation _),
    "p156_sole_late_suppliers" -> (soleLateSuppliers _),
    "p157_dormant_high_value" -> (dormantHighValue _),
    "p165_min_cost_supplier" -> (minCostSupplier _),
    "p166_promo_volume_suppliers" -> (promoVolumeSuppliers _),
    "p169_big_quantity_orders" -> (bigQuantityOrders _),
    "p170_supplier_relationship_count" -> (supplierRelationshipCount _),
    "p171_important_parts" -> (importantParts _),
    "p172_order_priority_check" -> (orderPriorityCheck _),
    "p173_priority_ship_split" -> (priorityShipSplit _),
    "p174_disjunctive_revenue" -> (disjunctiveRevenue _),
    "p175_forecast_revenue" -> (forecastRevenue _),
    "p176_volume_shipping" -> (volumeShipping _),
    "p177_nation_market_share" -> (nationMarketShare _),
    "p178_product_type_profit" -> (productTypeProfit _),
    "p179_returned_item_report" -> (returnedItemReport _),
    "p180_customer_order_distribution" -> (customerOrderDistribution _),
    "p181_top_supplier" -> (topSupplier _))
}
