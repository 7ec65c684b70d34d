package graft

import graft.expressions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point, installed via
  * `spark.sql.extensions=graft.GraftExtensions`
  * ([[graft.core.Sessions]] sets it).
  *
  * Registers the engine's native Catalyst expressions as SQL functions:
  *   - `graft_dot(array<double>, array<double>) -> double` — codegen'd
  *     vector dot product ([[graft.expressions.DotProduct]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_dot expects 2 arguments, got ${children.size}")
        DotProduct(children.head, children(1))
      }))
  }
}
