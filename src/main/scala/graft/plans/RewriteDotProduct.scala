package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{CosineF32, DotProductF32}

/** Optimizer rule (the `Rule[LogicalPlan]` extension point, SURVEY §4):
  * rewrites the declarative higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0D, (s, p) -> s + p) }}}
  *
  * into the codegen'd native kernel `DotProductF32(a, b)` — users write the
  * portable HOF formulation, the optimizer swaps in the allocation-free
  * implementation. Identical by construction for ALL inputs: same sequential
  * IEEE adds on the dense path, and the kernel returns NULL exactly where the
  * HOF does (length mismatch — zip_with pads with nulls, nulling the fold —
  * or a null element), so the rewrite is semantics-preserving even on ragged
  * or null-element ARRAY<FLOAT> columns.
  *
  * Registered via `GraftExtensions` (injectOptimizerRule) or applied
  * standalone to an analyzed plan.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** x, possibly wrapped in a cast to double. */
  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast if c.dataType == DoubleType => sameVar(c.child, v)
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(left, right,
            LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(aa, ap, _), Seq(a: NamedLambdaVariable, p: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(f: NamedLambdaVariable), _))
        if zero == 0.0 &&
          isFloatArray(left) && isFloatArray(right) &&
          ((sameVar(mx, x) && sameVar(my, y)) || (sameVar(mx, y) && sameVar(my, x))) &&
          ((sameVar(aa, a) && sameVar(ap, p)) || (sameVar(aa, p) && sameVar(ap, a))) &&
          fin.exprId == f.exprId =>
      DotProductF32(left, right)
  }
}

/** Companion rule: fuse the composed cosine
  *
  * {{{ dot_f32(a, b) / (sqrt(dot_f32(a, a)) * sqrt(dot_f32(b, b))) }}}
  *
  * into the single-traversal [[CosineF32]] kernel (three array passes → one).
  * Exact by construction: the fused loop performs the identical IEEE
  * accumulation for all three quantities and the identical final division,
  * and is NULL exactly where the composed form is (ragged lengths or a null
  * element null dot_f32, which nulls the division). Runs AFTER
  * [[RewriteDotProduct]] in registration order, so the fully-declarative HOF
  * cosine lowers in two steps: HOF → dot_f32 kernels → fused cosine.
  * Double division never raises under ANSI (0/0 is NaN for doubles), so the
  * fusion is eval-mode-indifferent. */
object RewriteCosine extends Rule[LogicalPlan] {

  private def norm(e: Expression, of: Expression): Boolean = e match {
    case DotProductF32(u, v) => u.semanticEquals(of) && v.semanticEquals(of)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotProductF32(a, b), Multiply(Sqrt(l), Sqrt(r), _), _)
        if (norm(l, a) && norm(r, b)) || (norm(l, b) && norm(r, a)) =>
      CosineF32(a, b)
  }
}
