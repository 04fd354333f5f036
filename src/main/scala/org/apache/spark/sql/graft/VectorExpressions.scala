// Lives under org.apache.spark.sql to reach the private[sql] Column<->
// Expression bridge (ExpressionUtils) — the conventional home for
// third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for vector math (SURVEY.md §2.E).
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate the
  * lambda per element in interpreted mode — correct, but the similarity
  * operators put a 64-element dot product in the innermost loop of an
  * O(N×Q) scan, so this is the one hot path worth a custom expression
  * (preference order (b) of the build contract: Expression before custom
  * plan, after built-ins).
  *
  * `DotProductD` generates a tight primitive `double` loop inside
  * whole-stage codegen — no lambda dispatch, no boxing. The summation is
  * strict left-to-right IEEE, the same fold as the higher-order-function
  * formulation and DuckDB's `list_dot_product`, so swapping it in changes
  * nothing numerically (oracle hashes stay identical).
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // null on length mismatch / null element, even for non-null inputs —
  // exactly the HOF fold's semantics (see below), hence nullable
  override def nullable: Boolean = true

  // Semantics match `aggregate(zip_with(a, b, _*_), 0.0, _+_)` EXACTLY so
  // the RewriteDotProduct optimizer rule is a pure substitution: zip_with
  // pads a shorter array with nulls and null propagates through *, + — so
  // unequal lengths or any null element yield NULL, not a truncated sum.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |${ev.value} = 0.0;
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

/** All hyperplane sign bits in ONE expression: bit p of the result is set
  * iff dot(v, planes(p)) > 0. Folding the whole signature into a single
  * node keeps the generated code one tight nested loop — 24 separate
  * dot-product expression trees took seconds of Janino compilation per
  * cold plan. The plane matrix rides along as a referenced constant
  * (`addReferenceObj`), not inline literals.
  */
case class HyperplaneSignature(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_hyperplane_sig"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    var sig = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * plane(i); i += 1 }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("planes", planes, "double[][]")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |${ev.value} = 0L;
         |for (int $p = 0; $p < $m.length; $p++) {
         |  int $n = java.lang.Math.min($a.numElements(), $m[$p].length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $m[$p][$i]; }
         |  if ($s > 0) ${ev.value} |= (1L << $p);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): HyperplaneSignature =
    copy(child = newChild)
}

/** Column-level API over the native expressions. */
object VectorFunctions {

  /** Bloom-filter membership probe as Spark's own native
    * `BloomFilterMightContain` expression (the one behind runtime row-level
    * filtering) over a driver-built `util.sketch.BloomFilter`. Unlike a
    * Scala UDF probe, this participates in whole-stage codegen, so the
    * pre-shuffle fact filter stays inside the generated scan loop. The
    * filter rides along as a binary literal — the same shape Spark's
    * injected runtime filters use (their bloom arrives as a scalar-subquery
    * result). Keys are probed raw (`mightContainLong`), matching
    * `DataFrameStatFunctions.bloomFilter`'s `putLong` on integral columns.
    */
  def bloomMightContain(
      bloom: org.apache.spark.util.sketch.BloomFilter, key: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bos.toByteArray, org.apache.spark.sql.types.BinaryType),
        ExpressionUtils.expression(key)))
  }

  /** Strict sequential dot product of two `array<double>` columns
    * (codegen'd; bit-identical to the `aggregate(zip_with(...))` fold).
    */
  def dotD(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductD(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** 64-bit sign-pattern signature of a vector against a plane matrix. */
  def hyperplaneSig(v: Column, planes: Array[Array[Double]]): Column =
    ExpressionUtils.column(HyperplaneSignature(ExpressionUtils.expression(v), planes))
}
