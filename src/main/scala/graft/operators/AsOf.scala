package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, the most recent right row with the
  * same key and right.ts ≤ left.ts.
  *
  * Spark-first plan (the union-window technique): tag both sides,
  * union, ONE shuffle on the key, then a running `last(_, ignoreNulls)`
  * ordered by (ts, tag) — right rows sort before left rows at equal
  * timestamps, giving the inclusive ≤ bound. No per-row subquery, no
  * range join; cost is a single hash partition + in-partition sort,
  * which is exactly the plan you want against a 100 TB event log.
  * (DuckDB expresses the same operator as ASOF JOIN — see the
  * q23_asof_join oracle.)
  */
object AsOf {

  /** @param valueCols right-side columns carried to the output (as
    *                  `asof_<name>`); left columns pass through. */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame = {
    val lCols = left.columns
    val tagged =
      right.select(Seq(col(key), col(ts), lit(0).as("asof_tag")) ++
          valueCols.map(c => col(c).as(s"asof_$c")) ++
          lCols.filterNot(c => c == key || c == ts).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
        .unionByName(
          left.select(Seq(col(key), col(ts), lit(1).as("asof_tag")) ++
            valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"asof_$c")) ++
            lCols.filterNot(c => c == key || c == ts).map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("asof_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("asof_tag") === 1).drop("asof_tag")
  }
}
