package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins for the broadcast-hint POLICY itself ([[Plans.hintGrowthBounded]]):
  * the predicate that decides which subtrees may carry an explicit
  * `broadcast()` in the TPC-H suite. The positive cases (nation/region
  * scans, root-position scalar aggregates) must pass; the SPOOF cases the
  * round-10 verdict flagged — a scalar aggregate buried under a join, a
  * path that merely CONTAINS "nation" — must FAIL, or the policy check in
  * PLANS.md is decorative.
  */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def plan(df: DataFrame) = df.queryExecution.analyzed

  test("growth-bounded: nation/region scans and root scalar aggregates qualify") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    assert(Plans.hintGrowthBounded(plan(nation)))
    assert(Plans.hintGrowthBounded(plan(
      nation.filter(col("n_regionkey") === 1).select("n_nationkey", "n_name"))))
    // nation ⋈ region: every leaf is a forever-bounded dim
    val region = spark.read.parquet(s"$sf/region.parquet")
    assert(Plans.hintGrowthBounded(plan(
      nation.join(region, col("n_regionkey") === col("r_regionkey")))))
    // 1-row scalar aggregate over a FACT at the subtree root — bounded by
    // construction, even though the scan under it scales
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    assert(Plans.hintGrowthBounded(plan(li.agg(sum("l_quantity").as("s")))))
    // row-preserving wrappers over the 1-row aggregate cannot re-grow it
    assert(Plans.hintGrowthBounded(plan(
      li.agg(sum("l_quantity").as("s")).select(col("s") * 2).filter(lit(true)))))
  }

  test("growth-bounded: corpus-scaling and spoof-shaped subtrees FAIL") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    // raw fact / dim-that-scales scans
    assert(!Plans.hintGrowthBounded(plan(li)))
    assert(!Plans.hintGrowthBounded(plan(cust.select("c_custkey"))))
    // GROUPED aggregate over a fact: output scales with group cardinality
    assert(!Plans.hintGrowthBounded(plan(
      li.groupBy("l_partkey").agg(sum("l_quantity")))))
    // the round-10 spoof: a scalar aggregate ANYWHERE in the subtree used
    // to qualify the whole thing — a fact joined against a 1-row agg is
    // still fact-sized and must fail
    val scalar = li.agg(avg("l_quantity").as("a"))
    assert(!Plans.hintGrowthBounded(plan(li.crossJoin(scalar))))
    // path-substring spoof: a scan whose PATH contains "nation" but whose
    // basename is not nation.parquet is not the bounded dim
    val tmp = java.nio.file.Files.createTempDirectory("graft_nationish_").toString
    spark.range(10).toDF("n_nationkey").write.parquet(s"$tmp/nation_like")
    assert(!Plans.hintGrowthBounded(plan(spark.read.parquet(s"$tmp/nation_like"))))
    // a LocalRelation leaf is not a HadoopFsRelation → neither arm applies
    assert(!Plans.hintGrowthBounded(plan(Seq((1, "x")).toDF("a", "b"))))
  }
}
