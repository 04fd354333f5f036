package graft

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.DotProductD
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v) }}}
  *
  * into the native codegen'd [[DotProductD]] expression.
  *
  * Why this matters at scale: higher-order functions evaluate their lambda
  * through an interpreted expression tree, one dispatch (plus the zipped
  * intermediate array allocation) per element — and a dot product is
  * exactly the kind of thing users write as a HOF and then put in the
  * innermost loop of an O(N×Q) similarity scan. The native expression is a
  * tight primitive loop inside whole-stage codegen. The substitution is
  * semantics-preserving bit-for-bit: both sides are the same strict
  * left-to-right IEEE fold, both yield NULL on length mismatch or null
  * elements (zip_with pads with nulls; null propagates through * and +).
  *
  * The pattern match is deliberately exact — element type double, zero
  * literal 0.0, multiply/add over precisely the bound lambda variables —
  * anything else (a different fold, reordered operands crossing lambda
  * scopes, non-double arrays) is left untouched.
  *
  * Injected by [[GraftExtensions]] via `injectOptimizerRule`; ExtensionsSpec
  * pins the rewrite and the `x_catalyst_dot` gate hash-verifies a query
  * through it end-to-end.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
            Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
        Literal(zero, DoubleType),
        LambdaFunction(Add(ma: NamedLambdaVariable, mv: NamedLambdaVariable, _),
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(fa: NamedLambdaVariable), _))
      // bit-exact +0.0 only: a fold seeded with -0.0 is observable
      // (e.g. products summing to -0.0 keep the sign; empty arrays return
      // the seed) and must not be rewritten — `-0.0 == 0.0` would match it
      if zero != null &&
        java.lang.Double.doubleToRawLongBits(zero.asInstanceOf[Double]) == 0L &&
        mx.exprId == zx.exprId && my.exprId == zy.exprId &&
        ma.exprId == acc.exprId && mv.exprId == v.exprId &&
        fin.exprId == fa.exprId &&
        isDoubleArray(a) && isDoubleArray(b) =>
      DotProductD(a, b)
  }
}
