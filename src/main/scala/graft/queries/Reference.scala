package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Q._

/** The reference's relational semantics (SURVEY.md §2.B), rebuilt natively on
  * the DataFrame API and transposed onto the driver testdata (FIXTURES.md §3:
  * transactions→orders/events, users→customer, payment methods→o_orderpriority,
  * products→part).
  *
  * The reference delegates all of these to ksqlDB over HTTP
  * (export_to_data_lake.py:48-79) — here each is a declarative Spark plan, so
  * Catalyst gets predicate pushdown / column pruning / broadcast selection for
  * free and there is no RPC hop.
  *
  * Scale notes (100 TB stance): joins against BOUNDED dimensions (nation =
  * 25 rows, region = 5 — fixed forever) are explicitly `broadcast()`; joins
  * against corpus-scaling tables (customer = 150k×sf, the slim orders
  * projection in b7) are left UNHINTED so AQE broadcasts them while they
  * fit and degrades to a shuffle join at cluster scale — an explicit hint
  * is honored all the way to the 8 GB broadcast cap and then kills the
  * query (SCALE.md §Joins). part (200k×sf) is corpus-scaling too — its
  * slim projections clear the 8 GB cap only up to ~sf300, far short of
  * the 100 TB (~sf100k) target — so b7/b8's part joins are likewise
  * AQE-chosen (round 9; broadcast at every tested sf). Aggregations run as
  * partial (map-side) + final — Spark's HashAggregate pair — so shuffled
  * bytes are proportional to group cardinality, not input rows.
  */
object Reference {

  /** Blacklisted "cities" transposed to nations (data_lake_config.py:71-78). */
  private val BlacklistNations: Seq[String] =
    Seq("NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4")

  /** B1 — projection/flatten (data_lake_config.py:55-62): nested transaction
    * → flat columns. nation (25 rows forever) is explicitly broadcast;
    * customer scales with the corpus (150k×sf rows — ~15M at sf100), so
    * its join is left UNHINTED: AQE broadcasts the 2-column projection at
    * small sf and degrades to a shuffle join at cluster scale instead of
    * dying at the 8 GB broadcast cap (SCALE.md §Joins). Only the projected
    * columns are read from parquet (column pruning).
    */
  def b1Flatten(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(
        o("o_orderkey").as("transaction_id"),
        n("n_name").as("user_country"),
        o("o_orderpriority").as("payment_method"),
        o("o_totalprice").as("amount"),
        o("o_orderdate").as("ts"))
  }

  val b1Oracle: String =
    """SELECT o_orderkey AS transaction_id, n_name AS user_country,
      |       o_orderpriority AS payment_method, o_totalprice AS amount,
      |       o_orderdate AS ts
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  /** B2 — blacklist filter (data_lake_config.py:71-78): semantically a
    * left-semi join against a blacklist dimension, with a derived `reason`
    * column (kafka_producer.py:52-58). The nation filter side is a
    * bounded broadcast; the blacklisted-customer set scales with customer
    * (~20% of it), so that semi-join is UNHINTED — AQE broadcasts it at
    * small sf, shuffles at scale (SCALE.md §Joins).
    */
  def b2Blacklist(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val blacklistedCustomers = c
      .join(broadcast(n.filter(n("n_name").isin(BlacklistNations: _*))),
        c("c_nationkey") === n("n_nationkey"), "left_semi")
      .select("c_custkey")
    o.join(blacklistedCustomers,
        o("o_custkey") === col("c_custkey"), "left_semi")
      .select(
        col("o_orderkey").as("transaction_id"),
        col("o_custkey").as("user_id"),
        when(col("o_totalprice") > 300000, "velocity")
          .when(col("o_orderkey") % 7 === 0, "stolen_card")
          .otherwise("fraud_pattern").as("reason"),
        col("o_orderdate").as("ts"))
  }

  val b2Oracle: String =
    """SELECT o_orderkey AS transaction_id, o_custkey AS user_id,
      |       CASE WHEN o_totalprice > 300000 THEN 'velocity'
      |            WHEN o_orderkey % 7 = 0 THEN 'stolen_card'
      |            ELSE 'fraud_pattern' END AS reason,
      |       o_orderdate AS ts
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM customer JOIN nation ON c_nationkey = n_nationkey
      |              WHERE c_custkey = o_custkey
      |                AND n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3','NATION_4'))""".stripMargin

  /** B3 — anonymize + EUR-convert + bucket (data_lake_config.py:63-70,
    * kafka_producer.py:46-51): SHA-256 16-char user hash, amount buckets
    * 0-10/10-50/50-100/>100, EUR conversion. Pure narrow projection — no
    * shuffle, fully inside whole-stage codegen.
    */
  def b3Anonymize(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    e.select(
      substring(sha2(concat(lit("salt_"), col("user_id").cast("string")), 256), 1, 16)
        .as("hash_user"),
      when(col("value") < 10, "0-10")
        .when(col("value") < 50, "10-50")
        .when(col("value") < 100, "50-100")
        .otherwise(">100").as("amount_bucket"),
      (col("value") * lit(0.92)).as("amount_eur"),
      col("ts_us"))
  }

  val b3Oracle: String =
    """SELECT substr(sha256('salt_' || CAST(user_id AS VARCHAR)), 1, 16) AS hash_user,
      |       CASE WHEN value < 10 THEN '0-10' WHEN value < 50 THEN '10-50'
      |            WHEN value < 100 THEN '50-100' ELSE '>100' END AS amount_bucket,
      |       value * CAST(0.92 AS DOUBLE) AS amount_eur,
      |       epoch_ns(ts) // 1000 AS ts_us
      |FROM events""".stripMargin

  /** B4 — user transaction summary (sync_to_mysql.py:42-55): GROUP BY user ×
    * type → SUM/COUNT/AVG/MIN/MAX + latest ts. `LATEST_BY_OFFSET` has no
    * batch equivalent; spec'd as MAX(ts) (SURVEY.md §7.4).
    */
  def b4UserSummary(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    // customer join unhinted: AQE broadcasts at small sf, shuffle join at
    // scale — a forced hint would OOM past the 8 GB cap (SCALE.md §Joins)
    val c = Tables.customer(s, d).select("c_custkey", "c_name")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(
        c("c_custkey").as("user_id"),
        c("c_name").as("user_name"),
        o("o_orderstatus").as("transaction_type"))
      .agg(
        moneySum(col("o_totalprice")).as("total_amount"),
        count(lit(1)).as("transaction_count"),
        moneyAvg(col("o_totalprice")).as("avg_amount"),
        min(col("o_totalprice")).as("min_amount"),
        max(col("o_totalprice")).as("max_amount"),
        max(col("o_orderdate")).as("last_transaction_date"))
  }

  val b4Oracle: String =
    """SELECT c_custkey AS user_id, c_name AS user_name, o_orderstatus AS transaction_type,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
      |       COUNT(*) AS transaction_count,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_amount,
      |       MIN(o_totalprice) AS min_amount,
      |       MAX(o_totalprice) AS max_amount,
      |       MAX(o_orderdate) AS last_transaction_date
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2, 3""".stripMargin

  /** B5 — EUR variant (sync_to_mysql.py:56-67): same grouping, metrics over
    * amount × exchange_rate; rate carried as a column (default 0.92).
    */
  def b5UserSummaryEur(s: SparkSession, d: String): DataFrame = {
    val rate = 0.92
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).select("c_custkey", "c_name")
    o.join(c, o("o_custkey") === c("c_custkey")) // unhinted, like b4
      .groupBy(
        c("c_custkey").as("user_id"),
        c("c_name").as("user_name"),
        o("o_orderstatus").as("transaction_type"))
      .agg(
        moneySum(col("o_totalprice") * lit(rate)).as("total_amount_eur"),
        count(lit(1)).as("transaction_count"),
        moneyAvg(col("o_totalprice") * lit(rate)).as("avg_amount_eur"))
      .withColumn("exchange_rate", lit(rate))
  }

  val b5Oracle: String =
    """SELECT c_custkey AS user_id, c_name AS user_name, o_orderstatus AS transaction_type,
      |       CAST(SUM(CAST(o_totalprice * CAST(0.92 AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE) AS total_amount_eur,
      |       COUNT(*) AS transaction_count,
      |       CAST(SUM(CAST(o_totalprice * CAST(0.92 AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_amount_eur,
      |       CAST(0.92 AS DOUBLE) AS exchange_rate
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2, 3""".stripMargin

  /** B6 — payment-method totals (sync_to_mysql.py:68-73): single-key global
    * aggregate. Five groups → partial agg collapses almost everything
    * map-side; the shuffle is a few rows per partition.
    */
  def b6PaymentTotals(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("payment_method"))
      .agg(
        moneySum(col("o_totalprice")).as("total_amount"),
        count(lit(1)).as("transaction_count"),
        moneyAvg(col("o_totalprice")).as("avg_amount"))

  val b6Oracle: String =
    """SELECT o_orderpriority AS payment_method,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
      |       COUNT(*) AS transaction_count,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_amount
      |FROM orders GROUP BY 1""".stripMargin

  /** B7 — product purchase counts with exact COUNT(DISTINCT)
    * (sync_to_mysql.py:74-83). BOTH joins are deliberately UNHINTED
    * (round 9): orders is fact-sized (1.5M×sf), and part (200k×sf) clears
    * the 8 GB broadcast cap only to ~sf300 — a forced broadcast() on
    * either is honored right up to the cap / driver OOM (an explicit hint
    * never falls back). Unhinted, AQE picks broadcast at small sf (both
    * projections are tiny) and degrades each join independently to a
    * shuffle at the scale where it stops fitting (the fallback is PROVEN
    * working for the orders side at sf1, SCALE.md). COUNT(DISTINCT)
    * expands via Spark's Expand (2 passes) either way.
    */
  def b7ProductCounts(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey", "l_extendedprice")
    val p = Tables.part(s, d).select("p_partkey", "p_name", "p_brand")
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    li.join(p, li("l_partkey") === p("p_partkey"))
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(
        p("p_partkey").as("product_id"),
        p("p_name").as("product_name"),
        p("p_brand").as("product_category"))
      .agg(
        count(lit(1)).as("purchase_count"),
        moneySum(col("l_extendedprice")).as("total_revenue"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        countDistinct(col("o_custkey")).as("unique_buyers"))
  }

  val b7Oracle: String =
    """SELECT p_partkey AS product_id, p_name AS product_name, p_brand AS product_category,
      |       COUNT(*) AS purchase_count,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |       COUNT(DISTINCT o_custkey) AS unique_buyers
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2, 3""".stripMargin

  /** B8 — FK dimension-lookup join (sync_to_mysql.py:146-152): inner
    * equi-join against a dimension small enough that AQE broadcasts it at
    * every tested sf; unhinted so it shuffle-degrades past the cap
    * (part scales with the corpus — SCALE.md §Joins).
    */
  def b8DimLookup(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("p_name"), col("p_brand"), col("l_extendedprice"))
  }

  val b8Oracle: String =
    """SELECT l_orderkey, l_linenumber, p_name, p_brand, l_extendedprice
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  /** B8b — referential-integrity audit ("unknown method ⇒ error",
    * sync_to_mysql.py:150-151) as a left-anti join; empty result = intact.
    */
  def b8Orphans(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d).select("p_partkey")
    li.join(p, li("l_partkey") === p("p_partkey"), "left_anti")
      .select(col("l_orderkey"), col("l_partkey"))
  }

  val b8OrphansOracle: String =
    """SELECT l_orderkey, l_partkey FROM lineitem
      |WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)""".stripMargin

  /** B9 — changelog-to-table / latest-value-per-key (sync_to_mysql.py:
    * 137-142): row_number over (key ORDER BY ts DESC) = 1. At scale this is
    * one shuffle on the key; no driver-side state.
    */
  def b9LatestPerKey(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_us"))
  }

  val b9Oracle: String =
    """SELECT event_id, user_id, event_type, value, epoch_ns(ts) // 1000 AS ts_us
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin

  /** B9b — TRUE `LATEST_BY_OFFSET` (sync_to_mysql.py:42-55): per key, the
    * payload from the delivery with the greatest Kafka offset — NOT the
    * greatest event timestamp. SURVEY.md §7.4 sanctions `max(ts)` for the
    * driver testdata (which carries no offsets); this gate closes the
    * deviation where offsets DO exist, by running the full wire path on a
    * deterministic changelog whose delivery order (the offset) deliberately
    * disagrees with event time. A correction delivered later (higher
    * offset) with an OLDER event timestamp must win — `max(ts)` would pick
    * the wrong row for most keys here, so the hash check pins the real
    * ksqlDB semantics.
    *
    * Kafka's ordering contract makes per-key offset order total: a key's
    * deliveries all land in one partition (keyed partitioning), and offsets
    * are monotone within a partition. The argmax is two-phase: `max(offset)`
    * per key (all-numeric buffer — a partial-agg'd HashAggregate pair, the
    * shuffle carries one row per key) and an equi-join back on
    * (key, offset) to fetch the winning payload. A `max_by`/`max(struct)`
    * one-pass form would carry a struct buffer and fall back to
    * SortAggregate (in-partition sorts of every delivery); a window
    * row_number would shuffle AND sort every delivery. This shape keeps
    * every operator hash-based: at 100 TB the join side built from the
    * aggregate is |keys| rows, broadcast- or shuffle-joinable by AQE.
    */
  /** The deterministic out-of-order changelog on the wire, shared by the
    * batch and streaming LATEST_BY_OFFSET gates: offset = delivery index,
    * ts = a multiplicative-hash scramble of it (gcd(2654435761, n) = 1 ⇒ a
    * permutation), so per key the offset-winner and the ts-winner are
    * different deliveries for most keys.
    */
  private[graft] def offsetChangelogWire(s: SparkSession): DataFrame = {
    val n = 10000L
    val payload = s.range(n).select(
      col("id"),
      (col("id") % 1000 + 1).as("user_id"),
      (((col("id") * 37) % 49900 + 100) / 100.0).as("amount"),
      timestamp_seconds(
        unix_timestamp(to_timestamp(lit("2024-01-01 00:00:00")))
          + (col("id") * 2654435761L) % lit(n)).as("ts"),
      when(col("id") % 10 < 8, "approved").otherwise("declined").as("status"))
    payload.select(
      col("user_id").cast("string").cast("binary").as("key"),
      to_json(struct(col("user_id"), col("amount"), col("ts"), col("status")))
        .cast("binary").as("value"),
      lit("transaction_stream").as("topic"),
      (col("user_id") % 8).cast("int").as("partition"),
      col("id").as("offset"),
      col("ts").as("timestamp"),
      lit(0).as("timestampType"))
  }

  /** Payload schema of [[offsetChangelogWire]] for the wire decode. */
  private[graft] val OffsetChangelogSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("user_id", LongType), StructField("amount", DoubleType),
      StructField("ts", TimestampType), StructField("status", StringType)))
  }

  def b9LatestByOffset(s: SparkSession, d: String): DataFrame = {
    val decoded = graft.streaming.KafkaIngest.parse(
      offsetChangelogWire(s), OffsetChangelogSchema)
    val winners = decoded.groupBy(col("user_id").as("w_user_id"))
      .agg(max(col("offset")).as("last_offset"))
    decoded.join(winners,
        col("user_id") === col("w_user_id") && col("offset") === col("last_offset"))
      .select(col("user_id"), col("amount").as("last_amount"),
        col("status").as("last_status"), unix_micros(col("ts")).as("last_ts_us"),
        col("last_offset"))
  }

  val b9OffsetOracle: String =
    """WITH deliveries AS (
      |  SELECT id AS off, id % 1000 + 1 AS user_id,
      |         ((id * 37) % 49900 + 100) / 100.0 AS amount,
      |         TIMESTAMP '2024-01-01 00:00:00' + to_seconds((id * 2654435761) % 10000) AS ts,
      |         CASE WHEN id % 10 < 8 THEN 'approved' ELSE 'declined' END AS status
      |  FROM range(0, 10000) t(id))
      |SELECT user_id, amount AS last_amount, status AS last_status,
      |       epoch_us(ts) AS last_ts_us, off AS last_offset
      |FROM deliveries
      |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY off DESC) = 1""".stripMargin

  /** The B4 semantics as literal SQL text through `spark.sql` — the
    * interface the reference's users actually write (ksqlDB statements).
    * Same oracle as the DataFrame formulation: the two front-ends must
    * agree exactly.
    */
  def b4SqlSurface(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_custkey AS user_id, c_name AS user_name, o_orderstatus AS transaction_type,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
        |       COUNT(*) AS transaction_count,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_amount,
        |       MIN(o_totalprice) AS min_amount,
        |       MAX(o_totalprice) AS max_amount,
        |       MAX(o_orderdate) AS last_transaction_date
        |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        |GROUP BY 1, 2, 3""".stripMargin)
  }

  /** B10 — positional column naming (sync_to_mysql.py:110-114): `toDF`. */
  def b10Rename(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).toDF("region_id", "region_name")

  val b10Oracle: String =
    "SELECT r_regionkey AS region_id, r_name AS region_name FROM region"

  val defs: Map[String, QueryFn] = Map(
    "b1_flatten" -> (b1Flatten _),
    "b2_blacklist" -> (b2Blacklist _),
    "b3_anonymize" -> (b3Anonymize _),
    "b4_user_summary" -> (b4UserSummary _),
    "b5_user_summary_eur" -> (b5UserSummaryEur _),
    "b6_payment_totals" -> (b6PaymentTotals _),
    "b7_product_counts" -> (b7ProductCounts _),
    "b8_dim_lookup" -> (b8DimLookup _),
    "b8_fk_orphans" -> (b8Orphans _),
    "b9_latest_per_key" -> (b9LatestPerKey _),
    "b9_latest_by_offset" -> (b9LatestByOffset _),
    "b4_sql_surface" -> (b4SqlSurface _),
    "b10_rename" -> (b10Rename _))

  val oracles: Map[String, String] = Map(
    "b1_flatten" -> b1Oracle,
    "b2_blacklist" -> b2Oracle,
    "b3_anonymize" -> b3Oracle,
    "b4_user_summary" -> b4Oracle,
    "b5_user_summary_eur" -> b5Oracle,
    "b6_payment_totals" -> b6Oracle,
    "b7_product_counts" -> b7Oracle,
    "b8_dim_lookup" -> b8Oracle,
    "b8_fk_orphans" -> b8OrphansOracle,
    "b9_latest_per_key" -> b9Oracle,
    "b9_latest_by_offset" -> b9OffsetOracle,
    "b4_sql_surface" -> b4Oracle,
    "b10_rename" -> b10Oracle)
}
