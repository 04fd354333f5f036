package graft

import org.apache.spark.sql.functions._
import graft.queries.Q

/** Unit + property tests for the aggregation helpers (SURVEY.md §5.2-5.3). */
class QueriesSpec extends SparkSpec {
  import spark.implicits._

  test("moneySum is exact on decimal-representable doubles") {
    val df = Seq(0.1, 0.2, 0.3, 100.01).toDF("v")
    assert(df.agg(Q.moneySum($"v")).as[Double].head() === 100.61)
  }

  test("moneySum/moneyAvg: empty input yields NULL sum, NULL avg") {
    val df = Seq.empty[Double].toDF("v")
    val r = df.agg(Q.moneySum($"v"), Q.moneyAvg($"v")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("moneySum is partition-order independent (associativity)") {
    val vals = (1 to 1000).map(i => i * 0.01 + 0.001 * (i % 7))
    val a = vals.toDF("v").repartition(1).agg(Q.moneySum($"v")).as[Double].head()
    val b = vals.toDF("v").repartition(13).agg(Q.moneySum($"v")).as[Double].head()
    assert(a === b)
  }

  test("property: min <= moneyAvg <= max; count consistency (seeded trials)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val xs = List.fill(1 + rnd.nextInt(200))(rnd.nextDouble() * 2000 - 1000)
      val df = xs.toDF("v")
      val row = df.agg(
        Q.moneyAvg($"v").as("avg"), min($"v").as("mn"), max($"v").as("mx"),
        count(lit(1)).as("cnt")).collect().head
      val (avg, mn, mx) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      // avg of 2dp-rounded values can undershoot raw min by at most half a cent
      assert(avg >= mn - 0.005 && avg <= mx + 0.005)
      assert(row.getLong(3) === xs.size)
    }
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("recursive CTE: chain length is floor(log2(key)) + 1; range window includes self") {
    val walk = graft.queries.Relational.recursiveCte(spark, "/root/testdata/sf0.001")
      .collect()
    assert(walk.nonEmpty)
    walk.foreach { r =>
      val k = r.getAs[Long]("start_key")
      val steps = r.getAs[Int]("steps")
      // k=0 never enters the recursive branch (WHERE k > 0): zero steps
      val expect = if (k == 0) 0 else (63 - java.lang.Long.numberOfLeadingZeros(k)) + 1
      assert(steps === expect, s"key $k: steps $steps != $expect")
    }
    val rng = graft.queries.Relational.windowRange(spark, "/root/testdata/sf0.001")
      .collect()
    // RANGE frame always contains at least the current row (and its peers)
    assert(rng.forall(_.getAs[Long]("cnt_7d") >= 1))
  }

  test("order statistics: quartiles are ordered and members of the value set") {
    val rows = graft.queries.Relational.statsOrder(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))
      assert(p25 <= p50 && p50 <= p75, s"quartiles out of order: $r")
      val med = r.getAs[Double]("med")
      assert(med >= p25 && med <= p75, s"median outside quartile range: $r")
    }
  }

  test("tpch q3 top-10 is strictly ordered with a deterministic tie-break") {
    val rows = graft.queries.Tpch.q3(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      val (ra, rb) = (a.getAs[Double]("revenue"), b.getAs[Double]("revenue"))
      assert(ra > rb || (ra == rb && a.getLong(0) < b.getLong(0)))
    }
  }

  test("LATEST_BY_OFFSET picks the offset-winner, not the ts-winner") {
    val r = graft.queries.Reference.b9LatestByOffset(spark, "/root/testdata/sf0.001")
    val rows = r.collect()
    assert(rows.length === 1000) // one row per key
    // ground truth straight from the generator arithmetic: per key, the
    // highest delivery index (= offset) wins regardless of its ts
    rows.foreach { row =>
      val k = row.getAs[Long]("user_id")
      val lastId = (0L until 10000L).filter(_ % 1000 + 1 == k).max
      assert(row.getAs[Long]("last_offset") === lastId, s"key $k")
    }
    // the planted ts scramble must make the deviation REAL: for most keys
    // the ts-argmax is a DIFFERENT delivery than the offset-argmax
    val disagree = (1L to 1000L).count { k =>
      val ids = (0L until 10000L).filter(_ % 1000 + 1 == k)
      val tsArgmax = ids.maxBy(id => (id * 2654435761L) % 10000L)
      tsArgmax != ids.max
    }
    assert(disagree > 800, s"only $disagree/1000 keys distinguish the semantics")
    // plan shape: hash-agg + join-back — never a window, never the
    // SortAggregate fall-back a struct-buffered max_by would plan
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "argmax must not plan a window")
    assert(!plan.contains("SortAggregate"), "argmax must stay hash-based")
  }

  test("recursive CTE guard: eager raised-limit path executes and restores the conf") {
    val key = "spark.sql.cteRecursionRowLimit"
    val prior = spark.conf.getOption(key)
    // a limit the sf0.001 walk (150 keys × ~25 levels) would exceed
    // forces the eager branch the sf1 corpus takes in production
    spark.conf.set(key, "1000")
    try {
      val out = graft.queries.Relational.recursiveCte(spark, "/root/testdata/sf0.001")
      assert(out.count() === 150) // one row per anchor key — guard did not trip
      assert(spark.conf.get(key) === "1000", "prior limit must be restored")
      // the eager branch must sever lineage (localCheckpoint): any later
      // recomputation would otherwise re-run the recursion under the
      // restored LOW limit and fail long after recursiveCte returned
      assert(!out.queryExecution.optimizedPlan.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.UnionLoop]),
        "recursion must be materialized — no UnionLoop left in the returned plan")
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("every oracle has a matching query entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("no query-name collisions across modules (Map ++ drops silently)") {
    import graft.queries.{Analytics, Lifecycle, Reference, Relational, Scale, Tpch}
    import graft.ext.{Dedup, FuzzyJoin, IncrementalCdc, IncrementalFuzzy, IncrementalIvf, IncrementalIvfPq, IncrementalLsh, IncrementalPq, IncrementalSimhash, Multimodal, Similarity, SuffixDedup, TextAnalysis}
    import graft.streaming.Streams
    val parts = Seq(
      Reference.defs, Relational.defs, Lifecycle.defs, Streams.defs,
      Scale.defs, Analytics.defs, Tpch.defs,
      TextAnalysis.defs, Dedup.defs, FuzzyJoin.defs, IncrementalCdc.defs, IncrementalFuzzy.defs, IncrementalIvf.defs, IncrementalIvfPq.defs,
      IncrementalLsh.defs, IncrementalPq.defs, IncrementalSimhash.defs, Similarity.defs, Multimodal.defs,
      SuffixDedup.defs)
    val totalKeys = parts.map(_.size).sum
    assert(SparkEntry.queries.size === totalKeys,
      s"combined map has ${SparkEntry.queries.size} entries but modules define $totalKeys — duplicate names")
  }
}
