package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.expressions.{FloatVecDot, FloatVecNormSq}

/** graft's optimizer extension (injected by [[graft.GraftExtensions]]):
  * `graft_dot(a, a)` ≡ `graft_normsq(a)` — same left-to-right
  * `Σ aᵢ·aᵢ` accumulation, but the norm form evaluates its child ONCE
  * (the dot spelling evaluates the array expression twice per row when
  * the child is itself computed, e.g. a slice or transform) and halves
  * the `isNullAt` checks in the generated loop.
  *
  * `semanticEquals` (not `==`) so cosmetic differences — attribute
  * capitalization, qualified vs bare references — still match, exactly
  * like Spark's own expression-canonicalization rules.
  *
  * Deliberately NOT rewritten: `graft_cosine(a, a)` → 1.0 would be wrong
  * for zero vectors (0/0 = NaN) and for null inputs.
  */
object RewriteSelfDotToNormSq extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case FloatVecDot(a, b) if a.semanticEquals(b) => FloatVecNormSq(a)
    }
}
