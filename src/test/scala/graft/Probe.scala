package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiling harness (test scope — not part of the library
  * jar): times named plan variants the same way Bench does
  * (toRdd.count), printing per-variant seconds so slow stages can be
  * attributed.
  * Usage: Test/runMain graft.Probe [sfDir] [nameSubstring]
  *
  * Round-18 body: attribute the q8/q48 level shifts the r17 driver
  * capture flagged (q8 0.12→0.30/0.76, q48 0.70→1.40/1.35 at the
  * quiet 11-run protocol) — stage variants at Bench's exact session
  * shape (local[4], shuffle.partitions=4) so the numbers compare.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error("pass sfDir or set SPARK_GRAFT_SF_DIR"))
    val only = args.drop(1).headOption.getOrElse("")
    // Bench's session shape, not GraftSession.local(32): the levels
    // under investigation were captured at local[4]/shuffle=4
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(df: => DataFrame): Unit = if (name.contains(only)) {
      // warm once, then time five runs — each on a FRESH DataFrame
      // (re-counting the same one reuses shuffle outputs and times
      // only the final stage, wildly under-reporting shuffle queries)
      df.queryExecution.toRdd.count()
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s med ${times.sorted.apply(2)}%.3f s  (runs: ${times.map(t => f"$t%.3f").mkString(", ")})")
    }

    // pure harness overhead: no files, one stage, no shuffle
    time("range_count")(spark.range(1000).toDF("i"))
    // one-shuffle overhead floor
    time("range_groupby")(spark.range(1000).toDF("i")
      .groupBy(col("i") % 7).count())

    // ---- q8_window_rank stages (supplier: 1000 rows) ----
    val supp = Tables.supplier(spark, sfDir)
    time("q8_scan_only")(supp)
    time("q8_window_only") {
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      supp.withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
        .select(col("s_nationkey"), col("s_suppkey"), col("rk"))
    }
    time("q8_full")(SparkEntry.queries("q8_window_rank")(spark, sfDir))

    // ---- q48_series_topk stages ----
    time("q48_full")(SparkEntry.queries("q48_series_topk")(spark, sfDir))

    // ---- fixed-overhead references with known r16 levels ----
    time("q7_full")(SparkEntry.queries("q7_topk")(spark, sfDir))
    time("q1_full")(SparkEntry.queries("q1_agg")(spark, sfDir))
    time("m12_full")(SparkEntry.queries("m12_dlq_routing")(spark, sfDir))

    spark.stop()
  }
}
