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
  * to parquet; Q3/Q5 broadcast every dimension (customer/nation/region —
  * the fact side never shuffles for those joins) and aggregate with
  * map-side partials; Q3's top-10 compiles to TakeOrderedAndProject.
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
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
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
      .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
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
      .join(broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))),
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

  /** Q14: promo-revenue share for one ship-month. Part is broadcast (the
    * fact side never shuffles); both the promo and total revenue are exact
    * decimal sums, and the percentage is ONE double division of two exact
    * values — identical in any engine.
    */
  def q14(s: SparkSession, d: String): DataFrame = {
    val term = dec(col("l_extendedprice")) * dec(lit(1.0) - col("l_discount"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
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
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val stats = li.groupBy(col("l_partkey").as("sp_partkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt_qty"))
    li.join(broadcast(stats), col("l_partkey") === col("sp_partkey"))
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
    * customer is broadcast by hint. Top-20 has a total order
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
      .join(broadcast(Tables.customer(s, d).select(col("c_custkey"), col("c_name"))),
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

  val defs: Map[String, Q.QueryFn] = Map(
    "q_tpch_q1" -> (q1 _),
    "q_tpch_q3" -> (q3 _),
    "q_tpch_q5" -> (q5 _),
    "q_tpch_q6" -> (q6 _),
    "q_tpch_q10" -> (q10 _),
    "q_tpch_q13" -> (q13 _),
    "q_tpch_q14" -> (q14 _),
    "q_tpch_q17" -> (q17 _),
    "q_tpch_q18" -> (q18 _),
    "q_tpch_q22" -> (q22 _))

  val oracles: Map[String, String] = Map(
    "q_tpch_q1" -> q1Oracle,
    "q_tpch_q3" -> q3Oracle,
    "q_tpch_q5" -> q5Oracle,
    "q_tpch_q6" -> q6Oracle,
    "q_tpch_q10" -> q10Oracle,
    "q_tpch_q13" -> q13Oracle,
    "q_tpch_q14" -> q14Oracle,
    "q_tpch_q17" -> q17Oracle,
    "q_tpch_q18" -> q18Oracle,
    "q_tpch_q22" -> q22Oracle)
}
