package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Flagship TPC-H-pattern reports over the warehouse star — the canonical
  * "can a reference user run their reporting workload here" check (Q1
  * pricing summary, Q3 unshipped-revenue top-N, Q5 local-supplier volume,
  * adapted to the driver schema: `o_orderpriority` stands in for Q3's
  * ship priority; date constants sit inside the 1995-2001 testdata span).
  *
  * Exactness: every revenue/charge term is a product of decimal(12,2)
  * casts — (12,2)×(12,2)→(25,4)×(12,2)→(38,6) stays exact in both engines,
  * so the aggregation order can differ freely; averages divide the exact
  * decimal sum by the count in IEEE double (correctly rounded once).
  * Q3's LIMIT has a total order (revenue DESC, o_orderkey) so the selected
  * top-10 is engine-deterministic including ties.
  *
  * Scale shape: Q1 is one partial-agg'd scan with the date filter pushed
  * to parquet; aggregations carry map-side partials; Q3's top-10 compiles
  * to TakeOrderedAndProject.
  *
  * Broadcast-hint policy (growth classes, SCALE.md §Joins): explicit
  * `broadcast()` appears ONLY on sides whose size is bounded by the data
  * model forever — nation (25 rows), region (5), and 1-row scalar
  * aggregates (q11 total, q15 max, q22 average). Everything that scales
  * with the corpus — customer, supplier, part, and any per-part /
  * per-supplier aggregate — is deliberately UNHINTED: AQE broadcasts it
  * while it fits `autoBroadcastJoinThreshold` (so the sf0.1 plan is
  * unchanged) and degrades to a shuffle join at cluster scale. An
  * explicit hint never falls back — Spark honors it up to the 8 GB
  * broadcast cap and then the query dies — so hinting a scaling input is
  * a scale-killer, not an optimization. Per-query hint counts are pinned
  * by graft.Plans (PLANS.md).
  */
object Tpch {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
  private def revenue = sum(dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount")))

  /** Q1: pricing summary by return flag / line status. */
  def q1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Q.moneySum(col("l_quantity")).as("sum_qty"),
        Q.moneySum(col("l_extendedprice")).as("sum_base_price"),
        revenue.cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount"))
          * dec(lit(1.0) + col("l_tax"))).cast("double").as("sum_charge"),
        Q.moneyAvg(col("l_quantity")).as("avg_qty"),
        Q.moneyAvg(col("l_extendedprice")).as("avg_price"),
        Q.moneyAvg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2)) * CAST(1.0 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY 1, 2""".stripMargin

  /** Q3: top-10 unshipped orders by revenue for one market segment. */
  def q3(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1997-03-15").cast("timestamp")
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < cut)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenue.cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3Oracle: String =
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** Q5: revenue from local suppliers (customer and supplier share a
    * nation) per nation of one region, one order-date year.
    */
  def q5(s: SparkSession, d: String): DataFrame = {
    val nat = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, d)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(revenue.cast("double").as("revenue"))
  }

  val q5Oracle: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  /** Q10: top-20 customers by revenue lost to returned items in one
    * quarter, with their nation — the classic returned-item report.
    */
  def q10(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(revenue.cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Oracle: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON n_nationkey = c_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Q6: forecast-revenue-change — the canonical pure-scan query. Every
    * predicate (ship-year, discount band, quantity cap) pushes to the
    * parquet reader; the whole query is one codegen'd scan + partial agg
    * with no shuffle wider than one row per partition. Revenue terms are
    * decimal(12,2)×(12,2) products so the sum is aggregation-order exact.
    */
  def q6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.05) && col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  val q6Oracle: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.05
      |  AND l_quantity < 24""".stripMargin

  /** Q13: customer order-count distribution — LEFT OUTER join with a
    * predicate on the join itself (orders of one priority class excluded
    * WITHOUT dropping order-less customers), then two stacked aggregates.
    * The second groupBy runs over one row per customer — after the first
    * agg the data is already tiny, so the distribution step is near-free.
    */
  def q13(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"))
      .join(Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority")),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "4-NOT SPECIFIED", "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  val q13Oracle: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT JOIN orders ON o_custkey = c_custkey
      |    AND o_orderpriority <> '4-NOT SPECIFIED'
      |  GROUP BY 1)
      |GROUP BY 1""".stripMargin

  /** Q14: promo-revenue share for one ship-month. The part join is
    * unhinted — AQE broadcasts the slim 2-column projection while it fits
    * and degrades to shuffle past the threshold (part scales with the
    * corpus). Both the promo and total revenue are exact decimal sums,
    * and the percentage is ONE double division of two exact values —
    * identical in any engine.
    */
  def q14(s: SparkSession, d: String): DataFrame = {
    val term = dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", term).otherwise(lit(0).cast("decimal(12,2)")))
          .cast("double").as("promo_revenue"),
        sum(term).cast("double").as("total_revenue"))
      .withColumn("promo_pct",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
  }

  val q14Oracle: String =
    """SELECT promo_revenue, total_revenue,
      |  100.0 * promo_revenue / total_revenue AS promo_pct
      |FROM (
      |  SELECT
      |    CAST(SUM(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))
      |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_revenue,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00')""".stripMargin

  /** Q17: small-quantity-order revenue — the classic correlated-aggregate
    * decorrelation pattern: "lineitems below 20% of their part's average
    * quantity". The correlated `avg` becomes ONE grouped aggregate over
    * only the brand's lineitems (semi-joined first, so the per-part stats
    * scan touches 20 parts' rows, not the table), joined back by part key.
    * The 20%-of-average test is rewritten integer-exact —
    * `5·qty·cnt < Σqty` over integer-valued doubles — so the boundary
    * cannot differ between engines (no 0.2·avg float round-trip).
    */
  def q17(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#23" && col("p_size") < 15)
      .select(col("p_partkey"))
    val li = Tables.lineitem(s, d)
      .join(parts, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val stats = li.groupBy(col("l_partkey").as("sp_partkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt_qty"))
    li.join(stats, col("l_partkey") === col("sp_partkey"))
      .filter(lit(5.0) * col("l_quantity") * col("cnt_qty") < col("sum_qty"))
      .agg(
        (sum(dec(col("l_extendedprice"))).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val q17Oracle: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN (
      |  SELECT l_partkey AS sp_partkey, SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt_qty
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey
      |  WHERE p_brand = 'Brand#23' AND p_size < 15
      |  GROUP BY 1) ON sp_partkey = l_partkey
      |WHERE p_brand = 'Brand#23' AND p_size < 15
      |  AND 5.0 * l_quantity * cnt_qty < sum_qty""".stripMargin

  /** Q18: large-volume customers — a group-HAVING subquery driving a
    * semi-join. The big-order set (sum qty > 300) is a partial-agg'd
    * aggregate that shrinks 600k lineitems to ~50 orderkeys BEFORE any
    * join; orders joins that tiny side (AQE broadcasts it at runtime) and
    * the customer join is likewise AQE-chosen (customer scales with the
    * corpus — unhinted, broadcast-while-fits). Top-20 has a total order
    * (o_totalprice DESC, o_orderkey) so the LIMIT is deterministic.
    */
  def q18(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val q18Oracle: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      |FROM orders
      |JOIN (
      |  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      |  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300) ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 20""".stripMargin

  /** Q22: dormant high-balance customers per nation — a scalar aggregate
    * subquery (global positive-balance average, one broadcast row) plus a
    * NOT EXISTS anti-join against recent orders. The anti-join's right
    * side is date-pruned at the scan; the customer side never widens.
    */
  def q22(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        Q.moneySum(col("c_acctbal")).as("totacctbal"))
  }

  val q22Oracle: String =
    """SELECT c_nationkey, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |    FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // Round-5 completion: the remaining 12 TPC-H patterns, adapted to the
  // driver schema (no partsupp table, no l_shipmode/l_commitdate/
  // l_receiptdate/p_container columns). Each adaptation preserves the
  // query's CHARACTERISTIC PLAN SHAPE — the thing TPC-H designed it to
  // exercise — against the columns that exist:
  //   Q2  correlated-max decorrelation + join-back   (partsupp → lineitem)
  //   Q4  EXISTS semi-join on date-windowed orders   (late commit → R flag)
  //   Q7  two-nation volume (as-is)
  //   Q8  national market share (as-is, p_type single-word)
  //   Q9  profit rollup (supplycost → retailprice·qty)
  //   Q11 group-HAVING vs scalar-subquery total      (partsupp → lineitem)
  //   Q12 CASE-pivot counts                          (shipmode → linestatus)
  //   Q15 view + scalar-max join-back (as-is)
  //   Q16 distinct-count with NOT-IN exclusion       (complaints → acctbal<0)
  //   Q19 disjunctive multi-column OR predicate      (container → size band)
  //   Q20 nested double-aggregate IN semi-join       (availqty → volume share)
  //   Q21 correlated EXISTS + NOT-EXISTS pair        (receipt late → ship late)
  // ---------------------------------------------------------------------

  /** Q2: for each small LARGE-type part, the EUROPE supplier(s) with the
    * highest account balance among suppliers that shipped it — the classic
    * correlated-aggregate-decorrelation: the per-part MAX becomes one
    * grouped aggregate joined back by (part, exact max value). The
    * part/supplier relation (TPC-H's partsupp) is derived as the DISTINCT
    * (l_partkey, l_suppkey) pairs of the fact table, SHRUNK before the
    * distinct by joining the filtered part dim into the fact scan first
    * (AQE broadcasts it while it fits), so the dedup shuffle carries only
    * the ~3% of pairs that can qualify.
    * Output keeps ALL tying suppliers (no arbitrary pick) and the LIMIT
    * has a total order, so the result is engine-deterministic.
    */
  def q2(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d)
      .filter(col("p_size") <= 10 && col("p_type") === "LARGE")
      .select(col("p_partkey"))
    val esup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val cand = Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
      .join(parts, col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("l_suppkey")).distinct()
      .join(esup, col("l_suppkey") === col("s_suppkey"))
    val mx = cand.groupBy(col("p_partkey").as("m_partkey"))
      .agg(max(col("s_acctbal")).as("max_bal"))
    cand.join(mx,
        col("p_partkey") === col("m_partkey") && col("s_acctbal") === col("max_bal"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"))
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_suppkey"))
      .limit(100)
  }

  val q2Oracle: String =
    """WITH esup AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON n_nationkey = s_nationkey
      |  JOIN region ON r_regionkey = n_regionkey WHERE r_name = 'EUROPE'),
      |cand AS (
      |  SELECT DISTINCT p_partkey, s_suppkey, s_name, s_acctbal, n_name
      |  FROM part JOIN lineitem ON l_partkey = p_partkey
      |  JOIN esup ON s_suppkey = l_suppkey
      |  WHERE p_size <= 10 AND p_type = 'LARGE'),
      |mx AS (SELECT p_partkey AS m_partkey, MAX(s_acctbal) AS max_bal
      |       FROM cand GROUP BY 1)
      |SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name
      |FROM cand JOIN mx ON p_partkey = m_partkey AND s_acctbal = max_bal
      |ORDER BY s_acctbal DESC, p_partkey, s_suppkey LIMIT 100""".stripMargin

  /** Q4: order-priority checking — one quarter of orders, kept iff EXISTS
    * a returned lineitem (the driver schema's stand-in for TPC-H's
    * commit-date-overrun). The EXISTS compiles to a LEFT SEMI join: the
    * fact side is filtered at the scan, the orders side is date-pruned,
    * and no lineitem column survives the join.
    */
  def q4(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  val q4Oracle: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY 1""".stripMargin

  /** Q7: volume shipping between two nations, by direction and ship year.
    * The nation dim (bounded, 2 rows after the filter) is broadcast by
    * hint into supplier and customer; the resulting supN/custN sides are
    * nation-FILTERED but still corpus-scaling, so their fact joins are
    * unhinted — AQE broadcasts them while they fit and the final orderkey
    * join shrinks because both inputs are already nation-filtered.
    */
  def q7(s: SparkSession, d: String): DataFrame = {
    val nat = Tables.nation(s, d)
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey"), col("n_name"))
    val supN = Tables.supplier(s, d)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custN = Tables.customer(s, d)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(custN, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
      .join(supN, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey") &&
        ((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
         (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("yr"))
      .agg(revenue.cast("double").as("revenue"))
  }

  val q7Oracle: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS yr,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |GROUP BY 1, 2, 3""".stripMargin

  /** Q8: national market share — NATION_5's share of STANDARD-part volume
    * sold into AMERICA, per order year. Numerator and denominator are both
    * exact decimal sums of the same product terms (the CASE arm types
    * match exactly), so the final share is ONE double division of two
    * engine-exact values.
    */
  def q8(s: SparkSession, d: String): DataFrame = {
    val vol = (dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount")))
      .cast("decimal(25,4)")
    val amer = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.customer(s, d)
      .join(broadcast(amer), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"))
    val supN = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "STANDARD")
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .join(supN, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(
        (sum(when(col("supp_nation") === "NATION_5", vol)
          .otherwise(lit(0).cast("decimal(25,4)"))).cast("double") /
          sum(vol).cast("double")).as("mkt_share"),
        count(lit(1)).as("n"))
  }

  val q8Oracle: String =
    """SELECT year(o_orderdate) AS yr,
      |  CAST(SUM(CASE WHEN n1.n_name = 'NATION_5'
      |    THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2)) AS DECIMAL(25,4))
      |    ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
      |  / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2)) AS DECIMAL(25,4))) AS DOUBLE) AS mkt_share,
      |  COUNT(*) AS n
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation n1 ON n1.n_nationkey = s_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n2 ON n2.n_nationkey = c_nationkey
      |JOIN region ON r_regionkey = n2.n_regionkey
      |WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  /** Q9: product-type profit by supplier nation and order year. The driver
    * schema has no ps_supplycost, so cost = p_retailprice · quantity — the
    * same multi-dimension join tree (part by name-fragment, supplier →
    * nation, orders for the year) and the same exact-decimal
    * revenue-minus-cost amount, summed per (nation, year).
    */
  def q9(s: SparkSession, d: String): DataFrame = {
    val amount = (dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount")))
      .cast("decimal(25,4)") -
      (dec(col("p_retailprice")) * dec(col("l_quantity"))).cast("decimal(25,4)")
    val supN = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d)
        .filter(col("p_name").contains("widget"))
        .select(col("p_partkey"), col("p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(supN, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("yr"))
      .agg(sum(amount).cast("double").as("sum_profit"))
  }

  val q9Oracle: String =
    """SELECT n_name AS nation, year(o_orderdate) AS yr,
      |  CAST(SUM(
      |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2)) AS DECIMAL(25,4))
      |    - CAST(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2""".stripMargin

  /** Q11: important stock — parts whose value (from one nation's
    * suppliers) exceeds a fixed fraction of that nation's total, i.e. a
    * group-HAVING tested against a scalar-subquery total. The total is
    * re-aggregated from the per-part sums (decimal addition is
    * associative, so Σgroups ≡ Σrows exactly) and broadcast as one row;
    * the fraction test `sum·400 > total` stays in exact decimal
    * arithmetic — no float threshold can disagree between engines.
    */
  def q11(s: SparkSession, d: String): DataFrame = {
    val supN = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_3")
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .join(supN, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("sval"))
    val tot = perPart.agg(sum(col("sval")).as("tot"))
    perPart.crossJoin(broadcast(tot))
      .filter(col("sval") * lit(400) > col("tot"))
      .select(col("l_partkey"), col("sval").cast("double").as("value"))
  }

  val q11Oracle: String =
    """WITH nli AS (
      |  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS val
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  WHERE n_name = 'NATION_3')
      |SELECT l_partkey, CAST(SUM(val) AS DOUBLE) AS value
      |FROM nli GROUP BY 1
      |HAVING SUM(val) * 400 > (SELECT SUM(val) FROM nli)""".stripMargin

  /** Q12: priority-class line counts per line status (the driver schema's
    * stand-in for ship mode) for one ship year — the canonical CASE-pivot
    * aggregate: one join, both counters computed in the same partial agg,
    * integer-exact.
    */
  def q12(s: SparkSession, d: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linestatus"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
  }

  val q12Oracle: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  /** Q15: top supplier — per-supplier revenue for one quarter (TPC-H's
    * revenue view), then the supplier(s) achieving the exact maximum. The
    * max is taken over the DECIMAL revenue (not its double projection) and
    * compared decimal-to-decimal, so "equals the max" is engine-exact;
    * ties all survive, making the result deterministic without arbitrary
    * picks. The max is one broadcast row (bounded forever, hinted); the
    * supplier join is unhinted — AQE broadcasts the 2-column projection
    * while it fits (supplier scales with the corpus).
    */
  def q15(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount")))
        .as("total_rev"))
    val mx = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev") === col("max_rev"))
      .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
  }

  val q15Oracle: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM supplier JOIN rev ON l_suppkey = s_suppkey
      |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""".stripMargin

  /** Q16: supplier count by part attributes — the part/supplier relation
    * derived from the fact table, suppliers with negative balances
    * excluded (the driver schema's stand-in for the complaints filter) via
    * an ANTI join, then COUNT(DISTINCT) per attribute triple. Both the
    * filtered part dim and the bad-supplier set scale with the corpus, so
    * both joins are unhinted — AQE broadcasts them while they fit, and at
    * that size the fact side still never shuffles before the
    * distinct-count's own exchange.
    */
  def q16(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 9, 19, 23, 36, 45, 49, 50))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val bad = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val q16Oracle: String =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 9, 19, 23, 36, 45, 49, 50)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  /** Q19: discounted revenue under a three-arm disjunctive predicate over
    * BOTH sides of the join (brand/size from part, quantity from
    * lineitem) — the query TPC-H designed to punish engines that cannot
    * reason through OR: Catalyst derives the per-side implied filters
    * (brand ∈ {...} on part, quantity ∈ [1,30] on lineitem) and pushes
    * them below the join while keeping the exact disjunction as the
    * residual condition.
    */
  def q19(s: SparkSession, d: String): DataFrame = {
    val arm1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
      col("l_quantity").between(1, 11)
    val arm2 = col("p_brand") === "Brand#23" && col("p_size").between(16, 30) &&
      col("l_quantity").between(10, 20)
    val arm3 = col("p_brand") === "Brand#3" && col("p_size").between(31, 50) &&
      col("l_quantity").between(20, 30)
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .join(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey") && (arm1 || arm2 || arm3))
      .agg(revenue.cast("double").as("revenue"), count(lit(1)).as("n_lines"))
  }

  val q19Oracle: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 16 AND 30 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 31 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** Q20: dominant suppliers — suppliers from three nations that shipped
    * MORE THAN HALF of some SMALL-type part's total 1997 volume (the
    * driver schema's stand-in for the availqty excess test). The nested
    * double aggregate (per part-supplier, then per part) feeds an IN
    * semi-join; `2·sq > tq` over integer-valued quantity sums is exact in
    * any engine. Both aggregates run over the part-filtered fact slice,
    * and the qualifying-supplier set reaching the semi-join is tiny.
    */
  def q20(s: SparkSession, d: String): DataFrame = {
    val pq = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.part(s, d).filter(col("p_type") === "SMALL")
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("sq"))
    val tot = pq.groupBy(col("l_partkey").as("t_partkey"))
      .agg(sum(col("sq")).as("tq"))
    val dominant = pq.join(tot, col("l_partkey") === col("t_partkey"))
      .filter(lit(2.0) * col("sq") > col("tq"))
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_7", "NATION_8", "NATION_9"))
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
  }

  val q20Oracle: String =
    """WITH pq AS (
      |  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_type = 'SMALL'
      |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  GROUP BY 1, 2),
      |tot AS (SELECT l_partkey AS t_partkey, SUM(sq) AS tq FROM pq GROUP BY 1)
      |SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier JOIN nation ON n_nationkey = s_nationkey
      |WHERE n_name IN ('NATION_7','NATION_8','NATION_9')
      |  AND s_suppkey IN (SELECT l_suppkey FROM pq
      |                    JOIN tot ON l_partkey = t_partkey WHERE 2*sq > tq)""".stripMargin

  /** Q21: suppliers who kept finished orders waiting — the correlated
    * EXISTS + NOT-EXISTS pair. "Late" is l_shipdate more than 60 days
    * after the order date (the driver schema has no receipt/commit
    * dates). A supplier's late line counts only if the order has ANOTHER
    * supplier's line (EXISTS → LEFT SEMI on orderkey with a non-equal
    * suppkey residual) and NO other supplier was also late (NOT EXISTS →
    * LEFT ANTI on the same shape over the late slice). Both probe sides
    * carry only (orderkey, suppkey).
    */
  def q21(s: SparkSession, d: String): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")
    val ordF = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val lateLines = li.join(ordF, col("l_orderkey") === col("o_orderkey"))
      .filter(late)
      .select(col("l_orderkey"), col("l_suppkey"))
    val supN = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3",
          "NATION_4", "NATION_5")).select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    lateLines
      .join(supN, col("l_suppkey") === col("s_suppkey"))
      .join(li.select(col("l_orderkey").as("o2_orderkey"), col("l_suppkey").as("o2_suppkey")),
        col("o2_orderkey") === col("l_orderkey") && col("o2_suppkey") =!= col("l_suppkey"),
        "left_semi")
      .join(lateLines.select(col("l_orderkey").as("l3_orderkey"), col("l_suppkey").as("l3_suppkey")),
        col("l3_orderkey") === col("l_orderkey") && col("l3_suppkey") =!= col("l_suppkey"),
        "left_anti")
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21Oracle: String =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
      |                  WHERE o3.o_orderstatus = 'F'
      |                    AND l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY 1
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  val defs: Map[String, Q.QueryFn] = Map(
    "q_tpch_q1" -> (q1 _),
    "q_tpch_q2" -> (q2 _),
    "q_tpch_q3" -> (q3 _),
    "q_tpch_q4" -> (q4 _),
    "q_tpch_q5" -> (q5 _),
    "q_tpch_q6" -> (q6 _),
    "q_tpch_q7" -> (q7 _),
    "q_tpch_q8" -> (q8 _),
    "q_tpch_q9" -> (q9 _),
    "q_tpch_q10" -> (q10 _),
    "q_tpch_q11" -> (q11 _),
    "q_tpch_q12" -> (q12 _),
    "q_tpch_q13" -> (q13 _),
    "q_tpch_q14" -> (q14 _),
    "q_tpch_q15" -> (q15 _),
    "q_tpch_q16" -> (q16 _),
    "q_tpch_q17" -> (q17 _),
    "q_tpch_q18" -> (q18 _),
    "q_tpch_q19" -> (q19 _),
    "q_tpch_q20" -> (q20 _),
    "q_tpch_q21" -> (q21 _),
    "q_tpch_q22" -> (q22 _))

  val oracles: Map[String, String] = Map(
    "q_tpch_q1" -> q1Oracle,
    "q_tpch_q2" -> q2Oracle,
    "q_tpch_q3" -> q3Oracle,
    "q_tpch_q4" -> q4Oracle,
    "q_tpch_q5" -> q5Oracle,
    "q_tpch_q6" -> q6Oracle,
    "q_tpch_q7" -> q7Oracle,
    "q_tpch_q8" -> q8Oracle,
    "q_tpch_q9" -> q9Oracle,
    "q_tpch_q10" -> q10Oracle,
    "q_tpch_q11" -> q11Oracle,
    "q_tpch_q12" -> q12Oracle,
    "q_tpch_q13" -> q13Oracle,
    "q_tpch_q14" -> q14Oracle,
    "q_tpch_q15" -> q15Oracle,
    "q_tpch_q16" -> q16Oracle,
    "q_tpch_q17" -> q17Oracle,
    "q_tpch_q18" -> q18Oracle,
    "q_tpch_q19" -> q19Oracle,
    "q_tpch_q20" -> q20Oracle,
    "q_tpch_q21" -> q21Oracle,
    "q_tpch_q22" -> q22Oracle)
}
