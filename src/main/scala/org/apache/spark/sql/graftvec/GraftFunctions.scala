package org.apache.spark.sql.graftvec

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** SQL registration for the native expressions, so `spark.sql` users
  * get them too: `SELECT vec_dot(a, b)`. Lives in the sql package
  * because FunctionRegistry access is private[sql].
  */
object GraftFunctions {
  private[graftvec] def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e.eval(null) match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => throw new IllegalArgumentException(s"expected integer literal, got $other")
    }

  def register(spark: SparkSession): Unit = {
    val reg = castToImpl(spark).sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "km_minhash", exprs => KmMinHash(exprs(0), intArg(exprs(1)), intArg(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction(
      "distinct_shingles", exprs => DistinctShingles(exprs(0), intArg(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "all_shingles", exprs => AllShingles(exprs(0), intArg(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash16", exprs => SimHash16(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash_w", exprs => SimHashW(exprs(0), intArg(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "cdc_chunks", exprs => CdcChunks(exprs(0), intArg(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "hll_registers", exprs => HllRegisters(exprs(0), intArg(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "envelope_marshal", exprs => EnvelopeMarshal(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "envelope_parse", exprs => EnvelopeParse(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "envelope_marshal_bin",
      exprs => EnvelopeMarshalBin(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "envelope_parse_bin", exprs => EnvelopeParseBin(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "media_stats", exprs => MediaStatsExpr(exprs(0)), "built-in")
  }
}
