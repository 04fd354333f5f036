package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for oracle-exact query pipelines.
  *
  * Cross-engine float determinism (SURVEY.md §7.4): SUM/AVG over doubles is
  * summation-order-dependent, and Spark's partial aggregation order differs
  * from DuckDB's. We therefore aggregate money through `decimal(18,2)` —
  * decimal addition is exact and associative, so any aggregation order gives
  * the same result — and cast the final value back to `double` (correctly
  * rounded, identical in both engines). AVG is computed as decimal-sum /
  * count in IEEE double, again order-independent.
  */
object Q {
  /** Exact, order-independent SUM of a monetary double column. */
  def moneySum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact, order-independent AVG of a monetary double column. */
  def moneyAvg(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(lit(1))

  /** Order-independent running/windowed SUM for window specs. */
  def moneySumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast("decimal(18,2)")).over(w).cast("double")

  /** Materialize `q` NOW, distributedly, and return the frozen result.
    *
    * For gates whose plan must execute under transient session state (an
    * installed governance policy, a flipped optimizer flag, a registered
    * view about to be dropped): returning the lazy frame would re-plan
    * after the state is restored, and `collect()`-ing pins the full result
    * on the driver — fine at gate scale, wrong posture at 100 TB. Instead
    * the plan executes once as a normal distributed parquet write and the
    * caller gets a plain scan of the snapshot, driver memory O(1).
    */
  def snapshot(q: DataFrame): DataFrame = {
    val dir = graft.Tmp.dir("graft_snap_").toString
    q.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)
    q.sparkSession.read.parquet(dir)
  }

  type QueryFn = (SparkSession, String) => DataFrame
}
