package graft.engine.rules

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.engine.expressions.CosineSimilarity

/** Optimizer rule: rewrite the higher-order-function cosine formulation
  *
  * {{{
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)
  *   / (sqrt(aggregate(transform(a, x -> x * x), 0.0D, (acc, x) -> acc + x))
  *      * sqrt(aggregate(transform(b, x -> x * x), 0.0D, (acc, x) -> acc + x)))
  * }}}
  *
  * into the native codegen'd [[CosineSimilarity]]. The HOF tree evaluates
  * INTERPRETED — per-element lambda dispatch, three passes over each vector,
  * outside whole-stage codegen — while the native expression is one fused
  * loop inside the codegen span. Users (and SQL authors porting from engines
  * with `list_cosine_similarity`) write the declarative form; this rule makes
  * it run at native speed without them knowing the expression exists.
  *
  * Semantics-preserving, exactly: same left-to-right accumulation order
  * (bit-equal results), null vector → null, null element → null. The one
  * divergence — [[CosineSimilarity]] uses the common prefix on mismatched
  * lengths where the HOF form yields null (zip_with pads with null) — is
  * closed by guarding the rewrite with `size(a) = size(b)`, which also
  * yields null for null inputs, matching HOF propagation. Equal-length
  * vectors (every real embedding corpus) pay two `numElements` calls for a
  * ~dim× fewer virtual-call evaluation.
  *
  * Matches structurally on the ANALYZED shapes the DataFrame/SQL HOF
  * builders produce (lambda-variable identity by exprId, zero literal,
  * identity finish lambda); `a`/`b` may appear in either order in the
  * denominator (`semanticEquals`). Anything else — different merge lambda, a
  * non-zero seed, a dot without norms — is left untouched.
  *
  * Inject via `spark.sql.extensions=graft.GraftExtensions` or at runtime
  * with [[graft.GraftExtensions.registerOn]].
  */
object RewriteHofCosine extends Rule[LogicalPlan] {

  private def sameVar(a: Expression, b: NamedLambdaVariable): Boolean =
    a match {
      case v: NamedLambdaVariable => v.exprId == b.exprId
      case _ => false
    }

  /** (acc, x) -> acc + x, either operand order. */
  private def isSumMerge(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Add(l, r, _),
        Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _) =>
      (sameVar(l, acc) && sameVar(r, x)) || (sameVar(l, x) && sameVar(r, acc))
    case _ => false
  }

  /** acc -> acc (the default finish the DSL/SQL builders attach). */
  private def isIdentityFinish(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(acc: NamedLambdaVariable), _) => v.exprId == acc.exprId
    case _ => false
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(d: Double, DoubleType) => d == 0.0
    case _ => false
  }

  /** aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, sum) → (a, b). */
  private object DotAgg {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          zero, merge: LambdaFunction, finish: LambdaFunction)
          if isZero(zero) && isSumMerge(merge) && isIdentityFinish(finish) &&
            ((sameVar(mx, x) && sameVar(my, y)) ||
              (sameVar(mx, y) && sameVar(my, x))) =>
        Some((a, b))
      case _ => None
    }
  }

  /** sqrt(aggregate(transform(a, x -> x * x), 0.0, sum)) → a. */
  private object NormSqrt {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(ArrayAggregate(
          ArrayTransform(a, LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable), _)),
          zero, merge: LambdaFunction, finish: LambdaFunction))
          if isZero(zero) && isSumMerge(merge) && isIdentityFinish(finish) &&
            sameVar(mx, x) && sameVar(my, x) =>
        Some(a)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotAgg(a, b), Multiply(NormSqrt(a2), NormSqrt(b2), _), _)
          if (a.semanticEquals(a2) && b.semanticEquals(b2)) ||
            (a.semanticEquals(b2) && b.semanticEquals(a2)) =>
        If(EqualTo(Size(a, legacySizeOfNull = false),
            Size(b, legacySizeOfNull = false)),
          CosineSimilarity(a, b), Literal(null, DoubleType))
    }
}
