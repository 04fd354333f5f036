package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.governance.Orchestrator
import graft.ingest.Ingest
import graft.lake.Lake
import graft.queries.Scale

class ScaleSpec extends SparkSpec {

  test("generator is deterministic and distributed (no driver loop)") {
    val a = Ingest.transactions(spark, 1000).collect()
    val b = Ingest.transactions(spark, 1000).collect()
    assert(a === b)
    assert(a.length === 1000)
    val amounts = a.map(_.getAs[Double]("amount"))
    assert(amounts.min >= 1.0 && amounts.max <= 500.0)
  }

  test("bucketed join plan contains no shuffle Exchange") {
    // disable broadcast so the join takes the sort-merge path it would at
    // 100 TB (at test scale the dim side would otherwise broadcast — also
    // exchange-free, but not the property under test)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joinPlan =
      try Scale.bucketedJoin(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // the final single-key groupBy may exchange; the JOIN itself must not:
    // assert no Exchange below the SortMergeJoin by checking the join's
    // immediate subtree markers (bucketed scans feed sorts directly)
    val lines = joinPlan.linesIterator.toSeq
    val joinIdx = lines.indexWhere(_.contains("SortMergeJoin"))
    assert(joinIdx >= 0, s"expected SortMergeJoin in:\n$joinPlan")
    val below = lines.drop(joinIdx)
    assert(!below.exists(_.contains("Exchange hashpartitioning")),
      s"join subtree should be exchange-free (bucket co-location):\n$joinPlan")
  }

  test("dpp join: fact scan carries a runtime partition filter and matches the plain join") {
    val df = Scale.dppJoin(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("dynamicpruning"),
      s"expected dynamicpruningexpression in fact PartitionFilters:\n$plan")
    // pruning must be invisible in results: compare against the direct join
    val direct = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .join(graft.Tables.supplier(spark, "/root/testdata/sf0.001")
        .filter(col("s_acctbal") > 5000), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"))
      .agg(count(lit(1)).as("lines"),
        graft.queries.Q.moneySum(col("l_extendedprice")).as("revenue"))
    assert(df.orderBy("s_suppkey").collect() === direct.orderBy("s_suppkey").collect())
  }

  test("sketch algebra: every boolean contract holds on real data") {
    val rows = Scale.approxSketches(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_is_member"), s"p50 not a member: $r")
      assert(r.getAs[Boolean]("p50_rank_ok"), s"p50 rank out of window: $r")
      assert(r.getAs[Boolean]("acd_partition_invariant"), s"layout-dependent ACD: $r")
      assert(r.getAs[Boolean]("hll_union_within_5pct"), s"union estimate off: $r")
    }
  }

  test("sketch estimates are within 5% of exact distinct counts (bounds gate)") {
    val rows = Scale.sketchBounds(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_within_5pct"), s"approx off: $r")
      assert(r.getAs[Boolean]("hll_within_5pct"), s"hll off: $r")
      assert(r.getAs[Boolean]("p50_in_range") && r.getAs[Boolean]("p95_in_range"), s"$r")
    }
  }

  test("salted aggregation equals plain aggregation") {
    val d = "/root/testdata/sf0.001"
    val salted = Scale.saltedAgg(spark, d).orderBy("l_returnflag").collect()
    val plain = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(queries.Q.moneySum(col("l_extendedprice")).as("total"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag").collect()
    assert(salted === plain)
  }

  test("orchestrator: second tick advances versions, all tasks ok") {
    val root = Files.createTempDirectory("orch_spec_").toString
    val d = "/root/testdata/sf0.001"
    val r1 = Orchestrator.runOnce(spark, d, root)
    assert(r1.forall(_.status == "ok"), r1.mkString("; "))
    assert(r1.find(_.task == "export_tables").get.detail === "version=v1")
    val r2 = Orchestrator.runOnce(spark, d, root)
    assert(r2.find(_.task == "export_tables").get.detail === "version=v2")
    assert(Lake.versions(spark, root, "dim_users") === Seq(1, 2))
    // warehouse merge is stable: same dim content in both versions
    val v1 = Lake.readTableFeed(spark, root, "dim_users", Some(1)).count()
    val v2 = Lake.readTableFeed(spark, root, "dim_users", Some(2)).count()
    assert(v1 === v2)
  }

  test("misra-gries: never overcounts, never misses a frequent item, any order") {
    val base = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ (1 to 40).map(i => s"t$i")
    val exact = base.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 5
    val rnd = new scala.util.Random(7)
    (0 until 5).foreach { _ =>
      val stream = rnd.shuffle(base)
      val summary = Scale.misraGries(stream.iterator, k).toMap
      assert(summary.size <= k)
      summary.foreach { case (t, c) =>
        assert(c <= exact(t), s"MG overcounted $t: $c > ${exact(t)}")
      }
      // freq > n/(k+1) = 120/6 = 20 must survive: a(50) and b(30)
      assert(summary.contains("a") && summary.contains("b"),
        s"frequent item missed in $summary")
    }
  }

  test("heavy-hitters gate: guarantees hold and counts are exact") {
    val Array(r) = Scale.heavyHitters(spark, "/root/testdata/sf0.001").collect()
    assert(r.getAs[Long]("missed_true_hh") === 0L)
    assert(r.getAs[Long]("overcount") === 0L)
    assert(r.getAs[Long]("n_tokens") > 0L)
  }
}
