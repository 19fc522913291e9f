package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Standard extension hook: deployments add
  * `spark.sql.extensions=graft.expressions.GraftExtensions` and every
  * session (including pure-SQL users) gets the engine's native functions
  * without touching code. [[FloatDot.register]] remains the programmatic
  * per-session path.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "graft_dot"),
      (children: Seq[Expression]) => FloatDot(children(0), children(1))))
}
