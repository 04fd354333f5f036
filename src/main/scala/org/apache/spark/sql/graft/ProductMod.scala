// Same package rationale as TopKPerKey.scala: third-party Catalyst
// extensions conventionally live under org.apache.spark.sql.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EvalMode, Expression, If, IsNull, Literal, Multiply, Pmod}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** `graft_product_mod(col)`: the product of `col` modulo the Mersenne prime
  * 2³¹−1, NULLs skipped, NULL on an empty group — an order- and
  * partitioning-invariant MULTISET fingerprint.
  *
  * The 100 TB use: cheap per-partition integrity checksums. After a
  * migration, compaction, or dedup re-shard, `groupBy(partition).agg(
  * graft_product_mod(id))` must match between source and target even though
  * row order, file layout, and shuffle placement all changed — multiplication
  * mod p is commutative/associative, and unlike `bit_xor` a duplicated row
  * does NOT cancel against itself, so double-writes are caught. Both inputs
  * and the buffer stay below 2³¹, so the product fits a long with no
  * overflow; Spark has no product aggregate of any kind built in.
  *
  * A [[DeclarativeAggregate]]: init/update/merge/evaluate are EXPRESSIONS,
  * so the aggregate participates in whole-stage codegen and partial
  * aggregation for free — the preferred shape for a custom aggregate (an
  * ImperativeAggregate would fall out of codegen; a UDAF would add
  * serialization per row).
  */
case class ProductMod(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  private val P = Literal(2147483647L) // 2^31 - 1, prime

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_product_mod"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.catalogString}")

  private lazy val prod = AttributeReference("prod", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(prod)
  override lazy val initialValues: Seq[Expression] = Seq(Literal.create(null, LongType))

  // both operands are already in [0, P) → the multiply stays below 2^62,
  // so LEGACY eval mode (no overflow check) is provably safe
  private def mulMod(a: Expression, b: Expression): Expression =
    Pmod(Multiply(a, b, EvalMode.LEGACY), P)

  override lazy val updateExpressions: Seq[Expression] = {
    val incoming = Pmod(child, P) // fold arbitrary longs (incl. negative) into [0, P)
    Seq(If(IsNull(child), prod, If(IsNull(prod), incoming, mulMod(prod, incoming))))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(prod.left), prod.right,
      If(IsNull(prod.right), prod.left, mulMod(prod.left, prod.right))))

  override lazy val evaluateExpression: Expression = prod

  override protected def withNewChildInternal(newChild: Expression): ProductMod =
    copy(child = newChild)
}
