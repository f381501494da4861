package org.apache.spark.sql.graftvec

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** SQL registration for the native expressions, so `spark.sql` users
  * get them too: `SELECT vec_dot(a, b)`. Lives in the sql package
  * because FunctionRegistry access is private[sql].
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    castToImpl(spark).sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
  }
}
