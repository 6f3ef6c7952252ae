package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.FloatVecDot

/** Session extension registering graft's native Catalyst expressions, so
  * they are callable from SQL and via `call_function` — the public,
  * Connect-compatible way to use a custom Expression in Spark 4.
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
  }
}
