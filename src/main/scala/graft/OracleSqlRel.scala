package graft

/** DuckDB oracle SQL for the star-schema relational queries (p68–p71).
  * Money math mirrors [[graft.ops.RelAnalytics]] exactly: 2-decimal
  * doubles → integer cents via round(x·100), all sums exact integers
  * (DuckDB sums BIGINT as HUGEINT — same values), one closing division
  * per output column in the same left-to-right order as the Spark
  * expressions, so the final doubles compare bit-for-bit.
  */
object OracleSqlRel {

  /** extendedprice·(1−discount) in 10⁻⁴-dollar units — exact integers. */
  private val rev =
    "CAST(round(l_extendedprice*100) AS BIGINT) * " +
      "(100 - CAST(round(l_discount*100) AS BIGINT))"

  val rel: Map[String, String] = Map(
    "p68_pricing_summary" ->
      s"""WITH l AS (
         |  SELECT l_returnflag, l_linestatus,
         |    CAST(l_quantity AS BIGINT) AS qty,
         |    CAST(round(l_extendedprice*100) AS BIGINT) AS ep,
         |    CAST(round(l_discount*100) AS BIGINT) AS d,
         |    CAST(round(l_tax*100) AS BIGINT) AS t
         |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         |), g AS (
         |  SELECT l_returnflag, l_linestatus,
         |    sum(qty) AS sum_qty, sum(ep) AS base_cents,
         |    sum(ep*(100-d)) AS disc_units,
         |    sum(ep*(100-d)*(100+t)) AS charge_units,
         |    sum(d) AS disc_pct_sum, count(*) AS count_order
         |  FROM l GROUP BY 1, 2
         |)
         |SELECT l_returnflag, l_linestatus,
         |  CAST(sum_qty AS BIGINT) AS sum_qty,
         |  CAST(base_cents AS DOUBLE) / CAST(100 AS DOUBLE) AS sum_base_price,
         |  CAST(disc_units AS DOUBLE) / CAST(10000 AS DOUBLE) AS sum_disc_price,
         |  CAST(charge_units AS DOUBLE) / CAST(1000000 AS DOUBLE) AS sum_charge,
         |  CAST(sum_qty AS DOUBLE) / CAST(count_order AS DOUBLE) AS avg_qty,
         |  CAST(base_cents AS DOUBLE) / CAST(100 AS DOUBLE)
         |    / CAST(count_order AS DOUBLE) AS avg_price,
         |  CAST(disc_pct_sum AS DOUBLE) / CAST(100 AS DOUBLE)
         |    / CAST(count_order AS DOUBLE) AS avg_disc,
         |  count_order
         |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "p69_top_orders" ->
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
         |  CAST(sum(rev) AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue
         |FROM (
         |  SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority, $rev AS rev
         |  FROM customer c
         |  JOIN orders o ON c_custkey = o_custkey
         |  JOIN lineitem l ON o_orderkey = l_orderkey
         |  WHERE c_mktsegment = 'BUILDING'
         |    AND o_orderdate < TIMESTAMP '1998-01-01'
         |    AND l_shipdate > TIMESTAMP '1998-01-01'
         |)
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "p70_nation_revenue" ->
      s"""SELECT n_name,
         |  CAST(sum($rev) AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue
         |FROM customer c
         |JOIN orders o ON c_custkey = o_custkey
         |JOIN lineitem l ON o_orderkey = l_orderkey
         |JOIN supplier s ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation n ON c_nationkey = n_nationkey
         |JOIN region r ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1995-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "p74_small_qty_revenue" ->
      s"""WITH l AS (
         |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         |         CAST(round(l_extendedprice*100) AS BIGINT) AS ep
         |  FROM lineitem
         |), a AS (
         |  SELECT l_partkey, sum(qty) AS sq, count(*) AS cnt
         |  FROM l GROUP BY 1
         |)
         |SELECT count(*) AS n_small_rows,
         |       CAST(sum(ep) AS DOUBLE) / CAST(100 AS DOUBLE) AS small_revenue
         |FROM l JOIN a USING (l_partkey)
         |WHERE CAST(qty AS DOUBLE) <
         |      CAST(0.2 AS DOUBLE) * (CAST(sq AS DOUBLE) / CAST(cnt AS DOUBLE))""".stripMargin,

    "p71_promo_share" ->
      s"""WITH j AS (
         |  SELECT $rev AS rev, p_type
         |  FROM lineitem l JOIN part p ON l_partkey = p_partkey
         |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
         |    AND l_shipdate < TIMESTAMP '1999-01-01'
         |), a AS (
         |  SELECT sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS promo_units,
         |         sum(rev) AS total_units
         |  FROM j
         |)
         |SELECT
         |  CAST(promo_units AS DOUBLE) / CAST(10000 AS DOUBLE) AS promo_revenue,
         |  CAST(total_units AS DOUBLE) / CAST(10000 AS DOUBLE) AS total_revenue,
         |  CAST(promo_units AS DOUBLE) / CAST(total_units AS DOUBLE) AS promo_share
         |FROM a""".stripMargin,

    // Q21-shaped sole-late-supplier (p156): the EXISTS / NOT EXISTS pair
    // verbatim — DuckDB decorrelates it the same way the Spark side
    // states it (semi + anti on l_orderkey).
    "p156_sole_late_suppliers" ->
      s"""WITH l AS (
         |  SELECT l_orderkey, l_suppkey,
         |    l_shipdate > o_orderdate + INTERVAL 365 DAY AS late
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE o_orderstatus = 'F'
         |), l1 AS (SELECT * FROM l WHERE late),
         |w AS (
         |  -- group by the KEY (the Spark side's rollup), name joined after,
         |  -- so twins stay structurally identical even under name ties
         |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
         |  FROM l1
         |  WHERE EXISTS (SELECT 1 FROM l l2
         |          WHERE l2.l_orderkey = l1.l_orderkey
         |            AND l2.l_suppkey <> l1.l_suppkey)
         |    AND NOT EXISTS (SELECT 1 FROM l1 l3
         |          WHERE l3.l_orderkey = l1.l_orderkey
         |            AND l3.l_suppkey <> l1.l_suppkey)
         |  GROUP BY l_suppkey
         |)
         |SELECT s_name, numwait
         |FROM w JOIN supplier ON w.l_suppkey = s_suppkey
         |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,

    // Q22-shaped dormant high-value customers (p157): scalar positive-
    // balance average (exact cents, one division) + NOT EXISTS against
    // the date-pruned orders slice.
    "p157_dormant_high_value" ->
      s"""WITH c AS (
         |  SELECT c_custkey, c_nationkey,
         |    CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
         |  FROM customer
         |), a AS (
         |  SELECT CAST(sum(bal_cents) AS BIGINT) AS s,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM c WHERE bal_cents > 0
         |), d AS (
         |  SELECT c.c_nationkey, c.bal_cents
         |  FROM c CROSS JOIN a
         |  WHERE CAST(bal_cents AS DOUBLE) > CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
         |    AND NOT EXISTS (SELECT 1 FROM orders o
         |          WHERE o.o_custkey = c.c_custkey
         |            AND o.o_orderdate >= TIMESTAMP '2000-06-01')
         |)
         |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_custs,
         |  CAST(sum(bal_cents) AS DOUBLE) / CAST(100 AS DOUBLE) AS total_acctbal
         |FROM d GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    // Q2-shaped min-cost supplier (p165): the correlated min-subquery
    // VERBATIM — DuckDB decorrelates it into the same per-part min over
    // the region-filtered lattice the Spark side states explicitly.
    "p165_min_cost_supplier" ->
      s"""WITH ps AS (
         |  SELECT l_partkey, l_suppkey,
         |    CAST(min(round(l_extendedprice*100)) AS BIGINT) AS cost_cents
         |  FROM lineitem GROUP BY 1, 2
         |), eur AS (
         |  SELECT s_suppkey, s_name, s_acctbal, n_name
         |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE'
         |)
         |SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_name,
         |  CAST(ps.cost_cents AS DOUBLE) / CAST(100 AS DOUBLE) AS supply_cost
         |FROM part p JOIN ps ON ps.l_partkey = p.p_partkey
         |JOIN eur s ON ps.l_suppkey = s.s_suppkey
         |WHERE p.p_type = 'PROMO' AND p.p_size <= 15
         |  AND ps.cost_cents = (
         |    SELECT min(ps2.cost_cents) FROM ps ps2
         |    JOIN eur s2 ON ps2.l_suppkey = s2.s_suppkey
         |    WHERE ps2.l_partkey = p.p_partkey)
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    // Q20-shaped promo-volume suppliers (p166): the nested EXISTS-in-IN
    // over two facts VERBATIM — a correlated scalar inside the HAVING of
    // an IN-subquery that itself contains an IN.
    "p166_promo_volume_suppliers" ->
      s"""SELECT s_name, n_name
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |WHERE s_suppkey IN (
         |  SELECT l_suppkey
         |  FROM lineitem l JOIN orders o ON l_orderkey = o_orderkey
         |  WHERE o_orderstatus = 'F'
         |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
         |  GROUP BY l_suppkey, l_partkey
         |  HAVING 8 * CAST(sum(l_quantity) AS BIGINT) > (
         |    SELECT CAST(sum(l2.l_quantity) AS BIGINT) FROM lineitem l2
         |    WHERE l2.l_partkey = l.l_partkey)
         |)
         |ORDER BY s_name""".stripMargin,

    // Q18-shaped large-volume orders (p169): the IN-with-HAVING over the
    // fact VERBATIM — DuckDB decorrelates it into the same per-order
    // rollup + join-back the Spark side states.
    "p169_big_quantity_orders" ->
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
         |  CAST(CAST(round(o_totalprice*100) AS BIGINT) AS DOUBLE)
         |    / CAST(100 AS DOUBLE) AS o_totalprice,
         |  sum_qty
         |FROM orders
         |JOIN (SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
         |      FROM lineitem GROUP BY 1
         |      HAVING CAST(sum(l_quantity) AS BIGINT) > 300) b
         |  ON o_orderkey = b.l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    // Q16-shaped supplier-relationship count (p170): NOT IN against the
    // flagged suppliers, distinct-supplier count per (p_type, p_size).
    "p170_supplier_relationship_count" ->
      s"""SELECT p_type, p_size,
         |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
         |JOIN part ON l_partkey = p_partkey
         |WHERE p_size <= 25
         |  AND l_suppkey NOT IN
         |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_type, p_size
         |ORDER BY supplier_cnt DESC, p_type, p_size""".stripMargin,

    // Q11-shaped important parts (p171): one nation's per-part value vs
    // the scale-free 3×-mean gate — the compare stays exact integer
    // (value·n > 3·total) on both engines.
    "p171_important_parts" ->
      s"""WITH v AS (
         |  SELECT l_partkey,
         |    CAST(sum(round(l_extendedprice*100)) AS BIGINT) AS value_cents
         |  FROM lineitem
         |  WHERE l_suppkey IN
         |        (SELECT s_suppkey FROM supplier WHERE s_nationkey = 3)
         |  GROUP BY 1
         |), t AS (
         |  SELECT CAST(sum(value_cents) AS BIGINT) AS tot,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM v
         |)
         |SELECT l_partkey,
         |  CAST(value_cents AS DOUBLE) / CAST(100 AS DOUBLE) AS part_value
         |FROM v CROSS JOIN t
         |WHERE value_cents * n > 3 * tot
         |ORDER BY part_value DESC, l_partkey""".stripMargin,

    // Q4-shaped order-priority check (p172): correlated EXISTS with the
    // 90-day lateness proxy VERBATIM.
    "p172_order_priority_check" ->
      s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
         |FROM orders o
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-04-01'
         |  AND EXISTS (SELECT 1 FROM lineitem l
         |        WHERE l.l_orderkey = o.o_orderkey
         |          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Q12-shaped priority split (p173): fact-to-fact join + two-way
    // conditional count per returnflag.
    "p173_priority_ship_split" ->
      s"""SELECT l_returnflag,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // Q6-shaped pure-scan revenue forecast (p175): three pushed
    // predicates, one global aggregate, revenue = Σ ep·d exact units.
    "p175_forecast_revenue" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
         |           * CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)
         |    / CAST(10000 AS DOUBLE) AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24""".stripMargin,

    // Q7-shaped volume shipping (p176): revenue between two named
    // nations per ship year, the cross-pair disjunction as a residual.
    "p176_volume_shipping" ->
      s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  CAST(sum($rev) AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ns ON s_nationkey = ns.n_nationkey
         |JOIN nation nc ON c_nationkey = nc.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
         |    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // Q8-shaped national market share (p177): one nation's fraction of
    // the STANDARD-part volume sold into ASIA, per order year — the
    // share divides two exactly-summed integer totals.
    "p177_nation_market_share" ->
      s"""WITH vol AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |    ns.n_name AS supp_nation, $rev AS v
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ns ON s_nationkey = ns.n_nationkey
         |  JOIN nation nc ON c_nationkey = nc.n_nationkey
         |  JOIN region ON nc.n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
         |    AND o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1998-01-01'
         |), a AS (
         |  SELECT o_year,
         |    sum(CASE WHEN supp_nation = 'NATION_7' THEN v ELSE 0 END) AS nat_units,
         |    sum(v) AS tot_units
         |  FROM vol GROUP BY 1
         |)
         |SELECT o_year,
         |  CAST(nat_units AS DOUBLE) / CAST(10000 AS DOUBLE) AS nation_volume,
         |  CAST(tot_units AS DOUBLE) / CAST(10000 AS DOUBLE) AS total_volume,
         |  CAST(nat_units AS DOUBLE) / CAST(tot_units AS DOUBLE) AS mkt_share
         |FROM a ORDER BY o_year""".stripMargin,

    // Q9-shaped product-type profit (p178): profit per supplier nation
    // per order year on name-matched parts; unit cost = 60% of
    // p_retailprice (the derived-lattice stand-in), all exact units.
    "p178_product_type_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum($rev
         |      - CAST(round(p_retailprice*100) AS BIGINT)
         |        * CAST(l_quantity AS BIGINT) * 60) AS DOUBLE)
         |    / CAST(10000 AS DOUBLE) AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%gear%'
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    // Q10-shaped returned-item report (p179): top-20 customers by
    // returned-line revenue for one order quarter.
    "p179_returned_item_report" ->
      s"""SELECT c_custkey, c_name,
         |  CAST(sum($rev) AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue,
         |  c_acctbal, n_name
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-04-01'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // Q13-shaped customer order-count distribution (p180): left outer
    // join into a two-level rollup, k = 0 customers included.
    "p180_customer_order_distribution" ->
      s"""WITH co AS (
         |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
         |  FROM customer LEFT OUTER JOIN orders
         |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
         |  GROUP BY c_custkey
         |)
         |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
         |FROM co GROUP BY c_count
         |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // Q15-shaped top supplier (p181): max-over-view with the equality on
    // EXACT integer units (no 1-ulp max trap).
    "p181_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, CAST(sum($rev) AS BIGINT) AS total_units
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-04-01'
         |  GROUP BY l_suppkey
         |)
         |SELECT s_suppkey, s_name,
         |  CAST(total_units AS DOUBLE) / CAST(10000 AS DOUBLE) AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_units = (SELECT max(total_units) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    // Q19-shaped disjunctive revenue (p174): the OR of brand × quantity
    // conjunctions across the join, revenue in exact integer units.
    "p174_disjunctive_revenue" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum($rev) AS DOUBLE) / CAST(10000 AS DOUBLE) AS revenue
         |FROM lineitem l JOIN part p ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 30)""".stripMargin)
}
