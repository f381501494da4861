package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.GraftFunctions
import graft.functions.{Portable, Vec}

class FunctionsSpec extends SparkSuite {

  test("vec_dot matches the composed higher-order form and registers for SQL") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val native = df.select(Vec.dot(col("a"), col("b"))).head.getDouble(0)
    val composed = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (s, x) => s + x))
      .head.getDouble(0)
    assert(native === composed)
    assert(native === 32.0)

    GraftFunctions.register(spark)
    assert(spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head.getDouble(0) === 11.0)
  }

  test("vec_dot participates in whole-stage codegen") {
    // a literal DataFrame would constant-fold to LocalTableScan, so
    // drive it from a parquet scan like the real operators do
    val df = Tables.embeddings(spark, sf)
      .select(transform(col("embedding"), _.cast("double")).as("e"))
      .select(Vec.dot(col("e"), col("e")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` stage prefix marks operators inside WholeStageCodegen
    assert(plan.linesIterator.exists(l => l.contains("vec_dot") && l.trim.startsWith("*")), plan)
    assert(df.head.getDouble(0) > 0.0)
  }

  test("shingleRows equals the array-transform shingles") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "x y"), (3L, ""), (4L, "p q r"))
      .toDF("doc_id", "text")
    val viaRows = Portable.shingleRows(docs, 3)
      .groupBy("doc_id").agg(sort_array(collect_list("s")).as("sh"))
    val viaArray = docs.select(col("doc_id"),
        sort_array(Portable.shingles(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    assert(viaRows.exceptAll(viaArray).count() === 0)
    assert(viaArray.exceptAll(viaRows).count() === 0)
  }

  test("portable hashes are stable across invocations and match known md5") {
    import spark.implicits._
    val df = Seq("abc").toDF("s")
    assert(df.select(Portable.md5hex(col("s"))).head.getString(0)
      === "900150983cd24fb0d6963f7d28e17f72")
    // first 15 hex chars of the digest, base 16
    assert(df.select(Portable.hash60(col("s"))).head.getLong(0)
      === java.lang.Long.parseLong("900150983cd24fb", 16))
  }
}
