package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import Q._

/** Relational operator coverage beyond the reference's own surface
  * (SURVEY.md §2.D): join variants, window functions, sorts/top-K, set
  * operations, rollup/cube/grouping sets, pivot, and the scalar function
  * library. All are Spark built-ins — zero custom rules — so Catalyst's
  * pushdown/pruning/codegen apply end-to-end.
  */
object Relational {

  /** Left outer join + aggregate: customers with zero orders survive with
    * NULL totals. At scale: orders shuffles on o_custkey; customer side is
    * the smaller input and AQE picks broadcast when it fits.
    */
  def joinLeft(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select("c_custkey")
    val o = Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey").as("user_id"))
      .agg(
        count(col("o_orderkey")).as("order_cnt"),
        moneySum(col("o_totalprice")).as("total_spent"))
  }

  val joinLeftOracle: String =
    """SELECT c_custkey AS user_id, COUNT(o_orderkey) AS order_cnt,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** Left-semi join: customers having at least one big order. */
  def joinSemi(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }

  val joinSemiOracle: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin

  /** Left-anti join: customers with no orders at all. */
  def joinAnti(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  val joinAntiOracle: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Full outer join between customer and per-customer order counts. */
  def joinFull(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select("c_custkey", "c_name")
    val oa = Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_cnt"))
    c.join(oa, c("c_custkey") === oa("o_custkey"), "full_outer")
      .select(
        coalesce(c("c_custkey"), oa("o_custkey")).as("key"),
        c("c_name").as("name"),
        col("order_cnt"))
  }

  val joinFullOracle: String =
    """SELECT COALESCE(c_custkey, o_custkey) AS key, c_name AS name, order_cnt
      |FROM customer
      |FULL JOIN (SELECT o_custkey, COUNT(*) AS order_cnt FROM orders GROUP BY 1) oa
      |  ON c_custkey = o_custkey""".stripMargin

  /** Cross join (tiny × tiny only — a cross join of facts is a plan bug). */
  def joinCross(s: SparkSession, d: String): DataFrame = {
    val a = Tables.region(s, d).select(col("r_name").as("r1"))
    val b = Tables.region(s, d).select(col("r_name").as("r2"))
    a.crossJoin(b)
  }

  val joinCrossOracle: String =
    "SELECT a.r_name AS r1, b.r_name AS r2 FROM region a CROSS JOIN region b"

  /** Range (band) join: quantity bucketed by an inline bounds dimension.
    * The bounds side is broadcast → a BroadcastNestedLoopJoin over 3 rows,
    * effectively a map-side bucket assignment.
    */
  def joinRange(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_quantity")
    val buckets = s.createDataFrame(
      java.util.Arrays.asList(Row(0.0, 10.0, "low"), Row(10.0, 30.0, "mid"), Row(30.0, 100.0, "high")),
      StructType(Seq(
        StructField("lo", DoubleType), StructField("hi", DoubleType),
        StructField("label", StringType))))
    li.join(broadcast(buckets), li("l_quantity") >= col("lo") && li("l_quantity") < col("hi"))
      .groupBy(col("label")).agg(count(lit(1)).as("cnt"))
  }

  val joinRangeOracle: String =
    """SELECT label, COUNT(*) AS cnt
      |FROM lineitem
      |JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 30.0, 'mid'), (30.0, 100.0, 'high')) b(lo, hi, label)
      |  ON l_quantity >= lo AND l_quantity < hi
      |GROUP BY 1""".stripMargin

  /** As-of join: for each purchase event, the latest click by the same user
    * at or before the purchase. Spark lacks a native as-of join; the classic
    * scalable construction is union-tag + running `last(..., ignoreNulls)`
    * window — ONE shuffle on user_id, no per-row subqueries, no skew
    * amplification (vs. the naive inequality join which is O(n·m) per key).
    */
  def joinAsof(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"), lit(0).as("side"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"), lit(1).as("side"))
    val tagged = clicks.withColumn("purchase_id", lit(null).cast("long"))
      .unionByName(purchases.withColumn("click_id", lit(null).cast("long")))
    // Order: ts, then side (click sorts before a same-ts purchase → `<=`
    // semantics), then click_id (latest same-ts click wins).
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("click_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_click", last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("purchase_id"), col("user_id"), col("asof_click").as("click_id"))
  }

  val joinAsofOracle: String =
    """SELECT p.event_id AS purchase_id, p.user_id, c.event_id AS click_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts""".stripMargin

  /** Ranking window functions + QUALIFY-style top-3 per group. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
  }

  val windowRankOracle: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |       rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
      |       row_number() OVER w AS rn
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |QUALIFY rn <= 3""".stripMargin

  /** Distribution window functions: percent_rank / cume_dist / ntile over a
    * total order (ties broken by key, so ranks — and hence the exact
    * rational values — are deterministic).
    */
  def windowDist(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.select(
      col("o_orderkey"), col("o_orderstatus"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"),
      ntile(4).over(w).as("quartile"))
  }

  val windowDistOracle: String =
    """SELECT o_orderkey, o_orderstatus,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist() OVER w AS cume,
      |       ntile(4) OVER w AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)""".stripMargin

  /** Moment statistics (mean / variance / stddev / covariance / correlation)
    * assembled from exact decimal power sums, combined in IEEE double — the
    * built-in `stddev`/`corr` accumulate doubles in partition order and
    * cannot oracle-match, but the sum-of-squares formulation is
    * order-independent and bit-identical.
    */
  def statsMoments(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    def dsum(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(28,4)")).cast("double")
    val agg = li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        dsum(col("l_quantity")).as("sx"),
        dsum(col("l_discount")).as("sy"),
        dsum(col("l_quantity") * col("l_quantity")).as("sxx"),
        dsum(col("l_discount") * col("l_discount")).as("syy"),
        dsum(col("l_quantity") * col("l_discount")).as("sxy"))
    agg.select(
      col("l_returnflag"),
      (col("sx") / col("n")).as("mean_qty"),
      ((col("sxx") - col("sx") * col("sx") / col("n")) / col("n")).as("var_qty"),
      sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / col("n")).as("std_qty"),
      ((col("sxy") - col("sx") * col("sy") / col("n")) / col("n")).as("cov_qd"),
      {
        // zero-variance guard: Spark x/0 → NULL but DuckDB → ±inf/NaN, so
        // the degenerate case must be an explicit NULL in both engines
        val varx = col("sxx") - col("sx") * col("sx") / col("n")
        val vary = col("syy") - col("sy") * col("sy") / col("n")
        when(varx === 0.0 || vary === 0.0, lit(null).cast("double"))
          .otherwise((col("sxy") - col("sx") * col("sy") / col("n"))
            / sqrt(varx * vary)).as("corr_qd")
      })
  }

  val statsMomentsOracle: String =
    """WITH a AS (
      |  SELECT l_returnflag,
      |         CAST(COUNT(*) AS DOUBLE) AS n,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx,
      |         CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) AS sy,
      |         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
      |         CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS syy,
      |         CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag,
      |       sx / n AS mean_qty,
      |       (sxx - sx * sx / n) / n AS var_qty,
      |       sqrt((sxx - sx * sx / n) / n) AS std_qty,
      |       (sxy - sx * sy / n) / n AS cov_qd,
      |       CASE WHEN sxx - sx * sx / n = 0.0 OR syy - sy * sy / n = 0.0 THEN NULL
      |            ELSE (sxy - sx * sy / n)
      |                 / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) END AS corr_qd
      |FROM a""".stripMargin

  /** Running (cumulative) sum + lag, explicit ROWS frame. Decimal inside the
    * window keeps the running sum order-exact across engines.
    */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(
      col("event_id"), col("user_id"), col("ts_us"),
      moneySumOver(col("value"), w).as("running_value"),
      lag(col("event_id"), 1).over(ord).as("prev_event"))
  }

  val windowRunningOracle: String =
    """SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
      |       lag(event_id, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** Sliding frame: 7-row moving sum (decimal-exact). */
  def windowMoving(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    e.select(
      col("event_id"), col("user_id"),
      moneySumOver(col("value"), w).as("moving_sum"))
  }

  val windowMovingOracle: String =
    """SELECT event_id, user_id,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
      |         (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum
      |FROM events""".stripMargin

  /** Global top-K with a total (tie-broken) order — Spark executes as
    * TakeOrderedAndProject: per-partition top-K then driver merge, no full
    * sort even at 100 TB.
    */
  def sortTopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(10)

  val sortTopKOracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** UNION (distinct) of two key sets. */
  def setUnion(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nk"))
      .union(Tables.supplier(s, d).select(col("s_nationkey")))
      .distinct()

  val setUnionOracle: String =
    "SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier"

  /** INTERSECT: customers that actually ordered. */
  def setIntersect(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey").as("key"))
      .intersect(Tables.orders(s, d).select(col("o_custkey")))

  val setIntersectOracle: String =
    "SELECT c_custkey AS key FROM customer INTERSECT SELECT o_custkey FROM orders"

  /** EXCEPT: customer keys never ordering. */
  def setExcept(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey").as("key"))
      .except(Tables.orders(s, d).select(col("o_custkey")))

  val setExceptOracle: String =
    "SELECT c_custkey AS key FROM customer EXCEPT SELECT o_custkey FROM orders"

  /** DISTINCT projection. */
  def distinctPairs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select("o_orderstatus", "o_orderpriority").distinct()

  val distinctPairsOracle: String =
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"

  /** ROLLUP over the region→nation hierarchy with GROUPING markers. */
  def rollupAgg(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    val c = Tables.customer(s, d)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping(col("r_name")).cast("int").as("g_r"),
        grouping(col("n_name")).cast("int").as("g_n"),
        count(lit(1)).as("cnt"),
        moneySum(col("c_acctbal")).as("balance"))
  }

  val rollupAggOracle: String =
    """SELECT r_name, n_name,
      |       CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n,
      |       COUNT(*) AS cnt,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS balance
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)""".stripMargin

  /** CUBE over two independent dimensions. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_s"),
        grouping(col("o_orderpriority")).cast("int").as("g_p"),
        count(lit(1)).as("cnt"))

  val cubeAggOracle: String =
    """SELECT o_orderstatus, o_orderpriority,
      |       CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
      |       CAST(GROUPING(o_orderpriority) AS INT) AS g_p,
      |       COUNT(*) AS cnt
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin

  /** GROUPING SETS via SQL (the DataFrame API spells this rollup/cube). */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  val groupingSetsOracle: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  /** Pivot (conditional aggregation) — count by status per priority. */
  def pivotStatus(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("payment_method"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(
        col("payment_method"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))

  val pivotStatusOracle: String =
    """SELECT o_orderpriority AS payment_method,
      |       COUNT(*) FILTER (o_orderstatus = 'F') AS f_cnt,
      |       COUNT(*) FILTER (o_orderstatus = 'O') AS o_cnt,
      |       COUNT(*) FILTER (o_orderstatus = 'P') AS p_cnt
      |FROM orders GROUP BY 1""".stripMargin

  /** Scalar string-function library sampler. */
  def scalarStrings(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      lower(col("p_brand")).as("lo"),
      substring(col("p_name"), 1, 5).as("pre"),
      length(col("p_name")).as("len"),
      concat(col("p_brand"), lit(":"), col("p_type")).as("tagged"),
      regexp_replace(col("p_name"), " ", "_").as("snake"),
      regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
      trim(lit("  x  ")).as("trimmed"),
      lpad(col("p_partkey").cast("string"), 8, "0").as("padded"))

  val scalarStringsOracle: String =
    """SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
      |       substr(p_name, 1, 5) AS pre, length(p_name) AS len,
      |       p_brand || ':' || p_type AS tagged,
      |       regexp_replace(p_name, ' ', '_', 'g') AS snake,
      |       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
      |       trim('  x  ') AS trimmed,
      |       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded
      |FROM part""".stripMargin

  /** Scalar date/time function sampler. */
  def scalarDates(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("yr"),
      month(col("o_orderdate")).as("mo"),
      dayofmonth(col("o_orderdate")).as("dy"),
      quarter(col("o_orderdate")).as("qtr"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
      // o_orderdate reads as TIMESTAMP_NTZ; session TZ is UTC so the cast
      // to TIMESTAMP preserves the wall-clock instant DuckDB's epoch_us sees.
      unix_micros(col("o_orderdate").cast("timestamp")).as("epoch_us"))

  val scalarDatesOracle: String =
    """SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |       day(o_orderdate) AS dy, quarter(o_orderdate) AS qtr,
      |       date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since,
      |       epoch_us(o_orderdate) AS epoch_us
      |FROM orders""".stripMargin

  /** Scalar math + conditional sampler (IEEE-exact operations only). */
  def scalarMath(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_discount") - col("l_tax")).as("adiff"),
      floor(col("l_quantity")).as("fl"),
      ceil(col("l_quantity")).as("ce"),
      (col("l_partkey") % 97).as("m"),
      sqrt(col("l_extendedprice")).as("rt"),
      least(col("l_tax"), col("l_discount")).as("lo_rate"),
      greatest(col("l_tax"), col("l_discount")).as("hi_rate"),
      coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0)).as("disc_or"))

  val scalarMathOracle: String =
    """SELECT l_orderkey, l_linenumber,
      |       abs(l_discount - l_tax) AS adiff,
      |       CAST(floor(l_quantity) AS BIGINT) AS fl, CAST(ceil(l_quantity) AS BIGINT) AS ce,
      |       l_partkey % 97 AS m, sqrt(l_extendedprice) AS rt,
      |       least(l_tax, l_discount) AS lo_rate,
      |       greatest(l_tax, l_discount) AS hi_rate,
      |       COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_or
      |FROM lineitem""".stripMargin

  /** JSON extraction from the events.props payload column. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  val jsonExtractOracle: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events""".stripMargin

  /** UNPIVOT (melt): the inverse of [[pivotStatus]] — the wide per-status
    * counts fold back into (key, variable, value) long form, composed
    * directly over the pivot gate so the pair proves pivot∘unpivot is the
    * grouped aggregate.
    */
  def unpivotStatus(s: SparkSession, d: String): DataFrame =
    pivotStatus(s, d).unpivot(
      Array(col("payment_method")),
      Array(col("f_cnt"), col("o_cnt"), col("p_cnt")),
      "status", "cnt")

  val unpivotStatusOracle: String =
    """WITH p AS (
      |  SELECT o_orderpriority AS payment_method,
      |         COUNT(*) FILTER (o_orderstatus = 'F') AS f_cnt,
      |         COUNT(*) FILTER (o_orderstatus = 'O') AS o_cnt,
      |         COUNT(*) FILTER (o_orderstatus = 'P') AS p_cnt
      |  FROM orders GROUP BY 1)
      |SELECT payment_method, status, cnt
      |FROM (UNPIVOT p ON f_cnt, o_cnt, p_cnt INTO NAME status VALUE cnt)""".stripMargin

  /** Spark 4 VARIANT semi-structured type: `parse_json` once, then typed
    * path extraction with `variant_get` — including a nested object/array
    * path over a constructed payload. VARIANT keeps the parsed tree in a
    * binary form, so repeated path extractions don't re-parse the JSON
    * text per access the way chained `get_json_object` calls do — the
    * semi-structured answer to "100 TB of raw JSON event payloads".
    */
  def variantExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"),
        parse_json(col("props")).as("v"),
        parse_json(concat(lit("""{"a":{"b":["""),
          get_json_object(col("props"), "$.k"), lit(","),
          (get_json_object(col("props"), "$.k").cast("long") * 2).cast("string"),
          lit("]}}"))).as("nested_v"))
      .select(
        col("event_id"),
        variant_get(col("v"), "$.k", "bigint").as("k"),
        variant_get(col("nested_v"), "$.a.b[1]", "bigint").as("nested"))

  val variantExtractOracle: String =
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |       2 * CAST(json_extract_string(props, '$.k') AS BIGINT) AS nested
      |FROM events""".stripMargin

  /** Sessionization (gaps-and-islands): a new session starts when the gap
    * to the previous event exceeds 1 hour; one window pass assigns ids, one
    * aggregate summarizes sessions. The batch ground truth for the
    * streaming `session_window` operator.
    */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val gapUs = 3600L * 1000000L
    e.withColumn("prev_ts", lag(col("ts_us"), 1).over(byTime))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"))
  }

  val sessionizeOracle: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
      |         CASE WHEN lag(epoch_ns(ts) // 1000) OVER w IS NULL
      |                OR epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000) OVER w > 3600000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)),
      |sessions AS (
      |  SELECT user_id, ts_us,
      |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id, COUNT(*) AS events,
      |       MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us
      |FROM sessions GROUP BY 1, 2""".stripMargin

  /** Correlated scalar subquery (Catalyst rewrites to a left outer
    * aggregate join — no per-row execution).
    */
  def subqueryScalar(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_sq")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sq")
    s.sql(
      """SELECT o_orderkey, o_totalprice,
        |       (SELECT COUNT(*) FROM lineitem_sq WHERE l_orderkey = o_orderkey) AS n_lines,
        |       (SELECT MAX(l_extendedprice) FROM lineitem_sq WHERE l_orderkey = o_orderkey) AS max_line
        |FROM orders_sq""".stripMargin)
  }

  val subqueryScalarOracle: String =
    """SELECT o_orderkey, o_totalprice,
      |       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_lines,
      |       (SELECT MAX(l_extendedprice) FROM lineitem WHERE l_orderkey = o_orderkey) AS max_line
      |FROM orders""".stripMargin

  /** IN / NOT IN subqueries (→ semi/anti joins after rewrite). */
  def subqueryIn(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_sq")
    Tables.orders(s, d).createOrReplaceTempView("orders_in_sq")
    s.sql(
      """SELECT c_custkey, c_name,
        |       c_custkey IN (SELECT o_custkey FROM orders_in_sq WHERE o_totalprice > 300000) AS big_spender
        |FROM customer_sq""".stripMargin)
  }

  val subqueryInOracle: String =
    """SELECT c_custkey, c_name,
      |       c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000) AS big_spender
      |FROM customer""".stripMargin

  /** Array/map function library sampler over a constructed array column:
    * higher-order transform/filter, sort, slice, containment, and a map
    * built from entries — the collection-type surface §1.4 notes the
    * reference lacks entirely.
    */
  def arrayMapFuncs(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(col("l_linenumber"))).as("lines"),
        array_sort(collect_set(col("l_returnflag"))).as("flags"))
    // array-typed results are serialized to strings at the output boundary
    // (the hash compare operates on scalar cells)
    li.select(
      col("l_orderkey"),
      size(col("lines")).as("n_lines"),
      concat_ws(",", transform(col("lines"), x => (x * 2).cast("string"))).as("doubled"),
      concat_ws(",", transform(filter(col("lines"), x => x % 2 === 1),
        x => x.cast("string"))).as("odd_lines"),
      concat_ws(",", transform(slice(col("lines"), 1, 2), x => x.cast("string"))).as("first_two"),
      array_contains(col("flags"), "R").as("has_r"),
      element_at(col("lines"), -1).as("last_line"),
      aggregate(col("lines"), lit(0), (a, x) => a + x).as("line_sum"),
      map_from_arrays(col("flags"), transform(col("flags"), f => length(f)))
        .getItem("R").as("r_len"))
  }

  val arrayMapFuncsOracle: String =
    """WITH g AS (
      |  SELECT l_orderkey,
      |         list_sort(list(l_linenumber)) AS lines,
      |         list_sort(list(DISTINCT l_returnflag)) AS flags
      |  FROM lineitem GROUP BY 1)
      |SELECT l_orderkey,
      |       len(lines) AS n_lines,
      |       list_aggregate([CAST(x * 2 AS VARCHAR) for x in lines], 'string_agg', ',') AS doubled,
      |       COALESCE(list_aggregate([CAST(x AS VARCHAR) for x in list_filter(lines, x -> x % 2 = 1)], 'string_agg', ','), '') AS odd_lines,
      |       list_aggregate([CAST(x AS VARCHAR) for x in lines[1:2]], 'string_agg', ',') AS first_two,
      |       list_contains(flags, 'R') AS has_r,
      |       lines[-1] AS last_line,
      |       list_reduce(list_prepend(0, lines), (a, x) -> a + x) AS line_sum,
      |       map_from_entries([{k: f, v: length(f)} for f in flags])['R'][1] AS r_len
      |FROM g""".stripMargin

  /** Value-RANGE window frame: trailing 7-day order count + money sum per
    * customer. RANGE frames include ALL peers of the current order value —
    * semantics a ROWS frame cannot express when timestamps tie. Ordering by
    * integer epoch seconds keeps the frame boundary exact integer math in
    * both engines (no calendar-interval or float comparison ambiguity).
    * Scale shape: one hash exchange on o_custkey, per-partition sort, frame
    * evaluated in a single pass with a sliding aggregate buffer.
    */
  def windowRange(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .withColumn("od_s", unix_timestamp(col("o_orderdate")))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("od_s"))
      .rangeBetween(-7L * 86400, 0)
    o.select(
      col("o_orderkey"), col("o_custkey"), col("od_s"),
      count(lit(1)).over(w).as("cnt_7d"),
      moneySumOver(col("o_totalprice"), w).as("sum_7d"))
  }

  val windowRangeOracle: String =
    """SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) // 1000 AS od_s,
      |       COUNT(*) OVER w AS cnt_7d,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_7d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate) // 1000
      |             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Exact order statistics per group: discrete percentiles (the smallest
    * value whose cumulative distribution reaches p — always an element of
    * the set, so cross-engine exact), the interpolated median, and a
    * deterministic MODE (max frequency, ties broken by smallest value —
    * the built-in `mode()` leaves ties undefined, which can never
    * oracle-match). Mode via count-then-rank is two partial-agg passes,
    * never a per-group sort of raw rows.
    */
  def statsOrder(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val pct = li.groupBy(col("l_returnflag")).agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("p75"),
      expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("med"))
    val wm = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cnt").desc, col("l_quantity"))
    val mode = li.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wm))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"))
    pct.join(mode, Seq("l_returnflag"))
  }

  val statsOrderOracle: String =
    """WITH m AS (
      |  SELECT l_returnflag, l_quantity AS mode_qty,
      |         row_number() OVER (PARTITION BY l_returnflag
      |                            ORDER BY COUNT(*) DESC, l_quantity) AS rn
      |  FROM lineitem GROUP BY l_returnflag, l_quantity),
      |p AS (
      |  SELECT l_returnflag,
      |         percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
      |         percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50,
      |         percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75,
      |         percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS med
      |  FROM lineitem GROUP BY 1)
      |SELECT p.l_returnflag, p25, p50, p75, med, mode_qty
      |FROM p JOIN (SELECT l_returnflag, mode_qty FROM m WHERE rn = 1) mm
      |  ON p.l_returnflag = mm.l_returnflag""".stripMargin

  /** LATERAL VIEW posexplode: array → (position, element) rows. The oracle
    * recomputes positions by ordering (the array is sorted-distinct, so the
    * mapping is unambiguous). pos cast to long: DuckDB row_number is BIGINT.
    */
  def explodePos(s: SparkSession, d: String): DataFrame = {
    val g = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_linenumber"))).as("lines"))
    g.select(col("l_orderkey"), posexplode(col("lines")))
      .select(col("l_orderkey"), col("pos").cast("long").as("pos"), col("col").as("line"))
  }

  val explodePosOracle: String =
    """SELECT l_orderkey,
      |       row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS pos,
      |       l_linenumber AS line
      |FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)""".stripMargin

  /** Recursive CTE (Spark 4 WITH RECURSIVE → UnionLoop): per-key halving
    * walk c_custkey → c_custkey/2 → … → 0, aggregated to chain length and
    * chain sum. Each recursion level is one distributed step over the
    * previous level's output — level size never exceeds the anchor, and the
    * engine stops when the recursive branch is empty (max depth here is
    * log2(max custkey) ≈ 14, far under the 100-level guard).
    */
  def recursiveCte(s: SparkSession, d: String): DataFrame = {
    // The walk emits ~|customer| × log2(max key) rows; Spark's runaway
    // guard (spark.sql.cteRecursionRowLimit, default 1M) trips at sf≥1.
    // Scale the limit to the actual input (~25 levels deep per key, ×4
    // headroom) instead of disabling it — the guard still catches a truly
    // non-terminating recursion. The limit is enforced at EXECUTION, so
    // the walk is materialized here under the raised limit and the prior
    // value restored before returning — a session-wide weakened guard
    // would let every LATER recursion in the session run 100× too long.
    val n = Tables.customer(s, d).count()
    val key = "spark.sql.cteRecursionRowLimit"
    // ~25 levels per key; below the default guard the plain lazy plan is
    // returned untouched — the eager materialize-under-raised-limit path
    // (persist + count) costs ~2× wall-clock and is only worth paying when
    // the walk would otherwise trip the guard
    if (n * 25L < s.conf.getOption(key).map(_.toLong).getOrElse(1000000L)) {
      recursiveCteQuery(s, d)
    } else {
      val prior = s.conf.getOption(key)
      s.conf.set(key, math.max(1000000L, n * 100L).toString)
      try {
        // Eager localCheckpoint: executes the recursion while the scaled
        // limit is active AND severs the lineage, so a re-executed plan
        // cannot re-run the recursion under the restored low limit and
        // fail long after this returned. Trade-offs taken knowingly: the
        // checkpoint blocks are NOT replicated, so on a real cluster an
        // executor loss makes downstream reads FAIL outright (severed
        // lineage cannot recompute) — fine in this single-JVM deployment,
        // but a cluster caller with a configured checkpoint dir should
        // use reliable checkpoint() instead; and the blocks live for the
        // app lifetime (the persist didn't disappear, it moved into the
        // checkpoint), bounded here by the walk's own output size.
        recursiveCteQuery(s, d).localCheckpoint(eager = true)
      } finally prior match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  private def recursiveCteQuery(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """WITH RECURSIVE walk(start_key, k, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer_v
        |  UNION ALL
        |  SELECT start_key, k DIV 2, depth + 1 FROM walk WHERE k > 0
        |)
        |SELECT start_key, CAST(MAX(depth) AS INT) AS steps,
        |       CAST(SUM(k) AS BIGINT) AS key_sum
        |FROM walk GROUP BY start_key""".stripMargin)
  }

  val recursiveCteOracle: String =
    """WITH RECURSIVE walk(start_key, k, depth) AS (
      |  SELECT c_custkey, c_custkey, 0 FROM customer
      |  UNION ALL
      |  SELECT start_key, k // 2, depth + 1 FROM walk WHERE k > 0
      |)
      |SELECT start_key, CAST(MAX(depth) AS INT) AS steps,
      |       CAST(SUM(k) AS BIGINT) AS key_sum
      |FROM walk GROUP BY start_key""".stripMargin

  /** Ordered string aggregation (LISTAGG equivalent, deterministic order). */
  def stringAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("nk"))
      .agg(
        array_join(array_sort(collect_list(col("c_name"))), ",").as("names"),
        count(lit(1)).as("cnt"))

  val stringAggOracle: String =
    """SELECT c_nationkey AS nk, string_agg(c_name, ',' ORDER BY c_name) AS names,
      |       COUNT(*) AS cnt
      |FROM customer GROUP BY 1""".stripMargin

  /** Correlated LATERAL join (Spark 4 SQL): for every nation, its top-2
    * customers by account balance via a correlated LATERAL subquery — the
    * SQL-standard form of per-key top-k. Deterministic tie-break on
    * custkey; the planner decorrelates this into a ranked window, so the
    * declarative form costs the same as the window formulation.
    */
  def lateralJoin(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("nation_v")
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation_v n,
        |LATERAL (
        |  SELECT c_name, c_acctbal FROM customer_v c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        |) t""".stripMargin)
  }

  val lateralJoinOracle: String =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n,
      |LATERAL (
      |  SELECT c_name, c_acctbal FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
      |) t""".stripMargin

  /** Custom table-generating function (UDTF) through the extension point:
    * [[org.apache.spark.sql.graft.NGramsGenerator]] is a native Catalyst
    * `Generator` registered as `graft_ngrams`, driven here from plain SQL
    * via LATERAL VIEW — one row per positional word 3-gram. The oracle
    * reproduces the fan-out with DuckDB's LATERAL unnest; positions and
    * duplicate n-grams must agree exactly.
    */
  def generatorUdtf(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("docs_gen_v")
    s.sql(
      """SELECT doc_id, pos, ngram
        |FROM docs_gen_v
        |LATERAL VIEW graft_ngrams(text, 3) g AS pos, ngram
        |WHERE doc_id < 50""".stripMargin)
  }

  val generatorUdtfOracle: String =
    """SELECT doc_id, CAST(u.i - 1 AS INT) AS pos,
      |       ws[u.i] || ' ' || ws[u.i + 1] || ' ' || ws[u.i + 2] AS ngram
      |FROM (SELECT doc_id, string_split(text, ' ') AS ws
      |      FROM documents WHERE doc_id < 50) t,
      |LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) u""".stripMargin

  /** SQL scripting (Spark 4 `BEGIN ... END` compounds): session variables,
    * a WHILE loop and per-iteration scalar subqueries — the procedural
    * orchestration glue the reference scripts in Python
    * (beam_orchestrator.py's batch loops), expressed in the engine's own
    * SQL. The script partitions the count by `o_orderkey % 5` across loop
    * iterations; the oracle is the direct aggregate, so loop + variable
    * accumulation must reproduce the one-pass answer exactly.
    */
  def sqlScripting(s: SparkSession, d: String): DataFrame = {
    val prior = s.conf.getOption("spark.sql.scripting.enabled")
    try {
      s.conf.set("spark.sql.scripting.enabled", "true")
      Tables.orders(s, d).createOrReplaceTempView("orders_scr_v")
      s.sql(
        """BEGIN
          |  DECLARE i INT DEFAULT 0;
          |  DECLARE acc BIGINT DEFAULT 0;
          |  WHILE i < 5 DO
          |    SET acc = acc + (SELECT COUNT(*) FROM orders_scr_v WHERE o_orderkey % 5 = i);
          |    SET i = i + 1;
          |  END WHILE;
          |  SELECT acc AS total_orders, i AS iterations;
          |END""".stripMargin)
    } finally prior match {
      case Some(v) => s.conf.set("spark.sql.scripting.enabled", v)
      case None => s.conf.unset("spark.sql.scripting.enabled")
    }
  }

  val sqlScriptingOracle: String =
    "SELECT COUNT(*) AS total_orders, 5 AS iterations FROM orders"

  /** SQL-defined scalar function (Spark 4 `CREATE FUNCTION ... RETURN`):
    * the discounted-charge formula registered ONCE as a catalog-level SQL
    * UDF and used from a plain query — fully declarative, inlined by the
    * analyzer (no black-box lambda), so pushdown/codegen see through it.
    * The oracle inlines the same expression by hand.
    */
  def sqlUdf(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_charge(ep DOUBLE, disc DOUBLE, tax DOUBLE)
            |RETURNS DECIMAL(25,6)
            |RETURN CAST(CAST(ep AS DECIMAL(12,2)) * CAST(1.0 - disc AS DECIMAL(12,2))
            |            * CAST(1.0 + tax AS DECIMAL(12,2)) AS DECIMAL(25,6))""".stripMargin)
    s.sql(
      """SELECT l_returnflag,
        |       CAST(SUM(graft_charge(l_extendedprice, l_discount, l_tax)) AS DOUBLE)
        |         AS total_charge,
        |       COUNT(*) AS n
        |FROM lineitem_v GROUP BY 1""".stripMargin)
  }

  val sqlUdfOracle: String =
    """SELECT l_returnflag,
      |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
      |                     * CAST(1.0 - l_discount AS DECIMAL(12,2))
      |                     * CAST(1.0 + l_tax AS DECIMAL(12,2)) AS DECIMAL(25,6)))
      |         AS DOUBLE) AS total_charge,
      |       COUNT(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin

  val defs: Map[String, QueryFn] = Map(
    "d_lateral_join" -> (lateralJoin _),
    "d_generator_udtf" -> (generatorUdtf _),
    "d_sql_scripting" -> (sqlScripting _),
    "d_sql_udf" -> (sqlUdf _),
    "d_join_left" -> (joinLeft _),
    "d_join_semi" -> (joinSemi _),
    "d_join_anti" -> (joinAnti _),
    "d_join_full" -> (joinFull _),
    "d_join_cross" -> (joinCross _),
    "d_join_range" -> (joinRange _),
    "d_join_asof" -> (joinAsof _),
    "d_sessionize" -> (sessionize _),
    "d_window_rank" -> (windowRank _),
    "d_window_dist" -> (windowDist _),
    "d_stats_moments" -> (statsMoments _),
    "d_window_running" -> (windowRunning _),
    "d_window_moving" -> (windowMoving _),
    "d_sort_topk" -> (sortTopK _),
    "d_set_union" -> (setUnion _),
    "d_set_intersect" -> (setIntersect _),
    "d_set_except" -> (setExcept _),
    "d_distinct" -> (distinctPairs _),
    "d_rollup" -> (rollupAgg _),
    "d_cube" -> (cubeAgg _),
    "d_grouping_sets" -> (groupingSets _),
    "d_pivot" -> (pivotStatus _),
    "d_unpivot" -> (unpivotStatus _),
    "d_variant" -> (variantExtract _),
    "d_scalar_strings" -> (scalarStrings _),
    "d_scalar_dates" -> (scalarDates _),
    "d_scalar_math" -> (scalarMath _),
    "d_json_extract" -> (jsonExtract _),
    "d_subquery_scalar" -> (subqueryScalar _),
    "d_subquery_in" -> (subqueryIn _),
    "d_array_map_funcs" -> (arrayMapFuncs _),
    "d_window_range" -> (windowRange _),
    "d_stats_order" -> (statsOrder _),
    "d_explode_pos" -> (explodePos _),
    "d_recursive_cte" -> (recursiveCte _),
    "d_string_agg" -> (stringAgg _))

  val oracles: Map[String, String] = Map(
    "d_lateral_join" -> lateralJoinOracle,
    "d_generator_udtf" -> generatorUdtfOracle,
    "d_sql_scripting" -> sqlScriptingOracle,
    "d_sql_udf" -> sqlUdfOracle,
    "d_join_left" -> joinLeftOracle,
    "d_join_semi" -> joinSemiOracle,
    "d_join_anti" -> joinAntiOracle,
    "d_join_full" -> joinFullOracle,
    "d_join_cross" -> joinCrossOracle,
    "d_join_range" -> joinRangeOracle,
    "d_join_asof" -> joinAsofOracle,
    "d_sessionize" -> sessionizeOracle,
    "d_window_rank" -> windowRankOracle,
    "d_window_dist" -> windowDistOracle,
    "d_stats_moments" -> statsMomentsOracle,
    "d_window_running" -> windowRunningOracle,
    "d_window_moving" -> windowMovingOracle,
    "d_sort_topk" -> sortTopKOracle,
    "d_set_union" -> setUnionOracle,
    "d_set_intersect" -> setIntersectOracle,
    "d_set_except" -> setExceptOracle,
    "d_distinct" -> distinctPairsOracle,
    "d_rollup" -> rollupAggOracle,
    "d_cube" -> cubeAggOracle,
    "d_grouping_sets" -> groupingSetsOracle,
    "d_pivot" -> pivotStatusOracle,
    "d_unpivot" -> unpivotStatusOracle,
    "d_variant" -> variantExtractOracle,
    "d_scalar_strings" -> scalarStringsOracle,
    "d_scalar_dates" -> scalarDatesOracle,
    "d_scalar_math" -> scalarMathOracle,
    "d_json_extract" -> jsonExtractOracle,
    "d_subquery_scalar" -> subqueryScalarOracle,
    "d_subquery_in" -> subqueryInOracle,
    "d_array_map_funcs" -> arrayMapFuncsOracle,
    "d_window_range" -> windowRangeOracle,
    "d_stats_order" -> statsOrderOracle,
    "d_explode_pos" -> explodePosOracle,
    "d_recursive_cte" -> recursiveCteOracle,
    "d_string_agg" -> stringAggOracle)
}
