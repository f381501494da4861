package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSuite {

  test("per-slice HLL sketches merge to an accurate global cardinality") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct(col("l_partkey"))).head.getLong(0)
    // sketch per returnflag slice, then merge — no rescan of raw rows
    val sketches = Sketches.sketchBy(li, "l_returnflag", "l_partkey")
    assert(sketches.count() === 3)
    val merged = Sketches.mergeEstimate(sketches)
    val err = math.abs(merged - exact).toDouble / exact
    assert(err < 0.05, s"merged=$merged exact=$exact err=$err")
  }

  test("portable md5-HLL (q30) estimates within 2% of exact distincts") {
    val est = SparkEntry.queries("q30_hll_cardinality")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n) / n < 0.02, s"$k: est=$e exact=$n")
    }
  }

  test("hll_registers aggregate equals the row-based register form across partitionings") {
    val p = 8; val w = 60 - p
    val h = graft.functions.Portable.hash60(col("l_partkey").cast("string"))
    val li = Tables.lineitem(spark, sf).select(col("l_returnflag"), h.as("h"))
    // row-based reference: groupBy (group, bucket) max(rho), the form
    // the DuckDB oracle mirrors
    val bitlen = (w to 2 by -1).foldLeft(when(col("rest") >= (1L << (w - 1)), w)) {
      (acc, k) => acc.when(col("rest") >= (1L << (k - 2)), k - 1)
    }.otherwise(0)
    val rows = li
      .withColumn("bucket", shiftright(col("h"), w))
      .withColumn("rest", col("h") % (1L << w))
      .withColumn("rho", when(col("rest") === 0L, lit(w + 1)).otherwise(lit(w) - bitlen + 1))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(max(col("rho")).as("reg"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    // aggregate form, forced through a multi-partition merge
    val agg = li.repartition(7)
      .groupBy(col("l_returnflag"))
      .agg(graft.functions.Portable.hllRegisters(col("h"), p).as("regs"))
      .select(col("l_returnflag"), posexplode(col("regs")).as(Seq("bucket", "reg")))
      .filter(col("reg") > 0)
      .collect().map(r => (r.getString(0), r.getInt(1).toLong) -> r.getInt(2)).toMap
    assert(agg === rows)
  }

  test("per-group estimates track exact distincts") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.estimates(
        Sketches.sketchBy(li, "l_returnflag", "l_orderkey"), "l_returnflag")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n).toDouble / n < 0.05, s"$k: est=$e exact=$n")
    }
  }
}
