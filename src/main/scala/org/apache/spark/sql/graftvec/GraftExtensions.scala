package org.apache.spark.sql.graftvec

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions registration — the cluster-friendly way to
  * ship the library's native expressions: set
  * `spark.sql.extensions=org.apache.spark.sql.graftvec.GraftExtensions`
  * (or `builder.withExtensions(new GraftExtensions)`) and every
  * session, including pure-SQL ones, gets `vec_dot`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
  }
}
