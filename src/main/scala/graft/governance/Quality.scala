package graft.governance

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the engine-native generalization
  * of the reference's only schema contract — the EXPECTED_COLUMNS arity
  * guard, sync_to_mysql.py:110-114, and its unknown-FK error, :150-151).
  *
  * All row-level checks for one table evaluate in a SINGLE aggregation pass
  * (conditional sums over one scan — at 100 TB you cannot afford a scan per
  * rule); uniqueness rides the same pass via count vs approx-free exact
  * distinct, and referential checks are AQE-planned anti-join counts.
  */
object Quality {

  sealed trait Check { def name: String }
  case class NotNull(column: String) extends Check {
    val name = s"not_null($column)"
  }
  case class InRange(column: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range($column, $lo, $hi)"
  }
  case class Matches(column: String, regex: String) extends Check {
    val name = s"matches($column, $regex)"
  }
  case class Unique(column: String) extends Check {
    val name = s"unique($column)"
  }

  private def violationExpr(c: Check): Column = {
    val raw = c match {
      case NotNull(col0) => sum(when(col(col0).isNull, 1L).otherwise(0L))
      case InRange(col0, lo, hi) =>
        sum(when(col(col0) < lo || col(col0) > hi || col(col0).isNull, 1L).otherwise(0L))
      case Matches(col0, re) =>
        sum(when(!col(col0).rlike(re) || col(col0).isNull, 1L).otherwise(0L))
      case Unique(col0) => count(lit(1)) - countDistinct(col(col0))
    }
    // sum() over zero rows is NULL — an empty table has zero violations
    coalesce(raw, lit(0L))
  }

  /** Evaluate all checks over one table in one aggregation pass. Returns
    * (check, violations, total, passed) — deterministic, oracle-checkable.
    */
  def evaluate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggCols = count(lit(1)).as("_total") +:
      checks.zipWithIndex.map { case (c, i) => violationExpr(c).as(s"_v$i") }
    val row = df.agg(aggCols.head, aggCols.tail: _*).collect().head
    val total = row.getLong(0)
    checks.zipWithIndex.map { case (c, i) =>
      val v = row.getLong(i + 1)
      (c.name, v, total, v == 0L)
    }.toDF("check", "violations", "total", "passed")
  }

  /** FK values in `fact` with no match in `dim` — the single
    * implementation behind both the count-style check here and
    * Warehouse.requireFkIntact's fail-fast audit. The anti-join is
    * UNHINTED (SCALE.md §Joins growth classes): `dim` is caller-supplied
    * and may scale with the corpus (c8 checks orders→customer), so a
    * forced broadcast would be honored to the 8 GB cap and die; AQE
    * broadcasts the single-column key projection while it fits and
    * degrades to a shuffled anti-join past that.
    */
  def orphans(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String): DataFrame =
    fact.select(col(factKey))
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_anti")

  /** Referential check as a row: FK values in `fact` missing from `dim`. */
  def fkCheck(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String): (String, Long, Long, Boolean) = {
    val total = fact.count()
    val n = orphans(fact, dim, factKey, dimKey).count()
    (s"fk($factKey -> $dimKey)", n, total, n == 0L)
  }
}
