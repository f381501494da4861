package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed exact percentiles (linear interpolation, the
  * percentile_cont contract).
  *
  * Spark's built-in exact `percentile` aggregate buffers every value
  * per group — with few groups that is a handful of single-threaded
  * multi-hundred-MB sorts, and at 100 TB it simply cannot run. This
  * operator computes the same numbers in two parallel passes:
  *
  *   1. per-group count/min/max, then per-(group, value-range-bucket)
  *      counts → cumulative offsets locate, for every requested rank,
  *      the ONE bucket that contains it;
  *   2. only the rows of the needed buckets are fetched and locally
  *      ranked (parallelism = number of needed buckets), and the two
  *      straddling ranks are interpolated with the same formula the
  *      built-in uses: v_lo·(⌈p⌉−p) + v_hi·(p−⌊p⌋).
  *
  * Work is O(data) map-side + O(groups × buckets) + O(needed-bucket
  * rows log) — no per-group全sort, no driver collection.
  */
object Percentiles {

  /** @param qs (outputColumnName, quantile in [0,1]) pairs
    * @param minMaxCols optional (minName, maxName): also emit the
    *   group's min/max — free, the bucketing pass computes them
    *   anyway (callers previously re-scanned the input for them). */
  def exact(df: DataFrame, keyCol: String, valCol: String,
            qs: Seq[(String, Double)], buckets: Int = 4096,
            minMaxCols: Option[(String, String)] = None): DataFrame = {
    val k = col(keyCol)
    val v = col(valCol).cast("double")

    // repartition materializes the (tiny) per-group stats behind one
    // exchange that BOTH consumers (the broadcast into `bucketed` and
    // the rank-target derivation `tq`) reuse — without it each
    // consumer re-aggregates the full input.
    val stats = df.groupBy(k.as("sk"))
      .agg(count(v).as("n"), min(v).as("vmin"), max(v).as("vmax"))
      .repartition(col("sk"))

    val bucketed = df.select(k.as("bk"), v.as("pv"))
      .join(broadcast(stats), col("bk") === col("sk"))
      .withColumn("bucket",
        when(col("vmax") <= col("vmin"), lit(0)).otherwise(
          least(floor((col("pv") - col("vmin")) / (col("vmax") - col("vmin")) * buckets).cast("int"),
            lit(buckets - 1))))
      .select(col("bk"), col("pv"), col("bucket"))

    val wc = Window.partitionBy(col("ck")).orderBy(col("bucket"))
    val cum = bucketed.groupBy(col("bk").as("ck"), col("bucket"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("cum_end", sum(col("bn")).over(wc))
      .withColumn("cum_start", col("cum_end") - col("bn"))

    // requested ranks (1-based): ⌊pos⌋+1 and its successor
    val tq = stats
      .select(col("sk"), col("n"), col("vmin"), col("vmax"),
        explode(array(qs.map { case (nm, q) =>
          struct(lit(nm).as("qname"), lit(q).as("q"))
        }: _*)).as("t"))
      .select(col("sk"), col("n"), col("vmin"), col("vmax"),
        col("t.qname").as("qname"), col("t.q").as("q"))
      .withColumn("pos", (col("n") - 1).cast("double") * col("q"))
      .withColumn("rlo", floor(col("pos")).cast("long") + 1)
      .withColumn("rhi", least(col("rlo") + 1, col("n")))

    val ranks = tq.select(col("sk").as("rk"), col("rlo").as("rank"))
      .unionAll(tq.select(col("sk").as("rk"), col("rhi").as("rank")))
      .distinct()

    // locate each rank's bucket via the cumulative offsets
    val located = ranks.join(cum,
        col("rk") === col("ck") &&
        col("rank") > col("cum_start") && col("rank") <= col("cum_end"))
      .select(col("rk"), col("rank"), col("bucket").as("lbucket"), col("cum_start"))

    // fetch + locally rank only the needed buckets
    val needed = located.select(col("rk").as("nk"), col("lbucket").as("nbucket")).distinct()
    val wr = Window.partitionBy(col("bk"), col("bucket")).orderBy(col("pv"))
    val rankValues = bucketed
      .join(broadcast(needed), col("bk") === col("nk") && col("bucket") === col("nbucket"))
      .withColumn("lr", row_number().over(wr))
      .join(broadcast(located),
        col("bk") === col("rk") && col("bucket") === col("lbucket") &&
        col("lr") === col("rank") - col("cum_start"))
      .select(col("bk").as("vk"), col("rank").as("vrank"), col("pv").as("rval"))

    val lo = rankValues.select(col("vk").as("lo_k"), col("vrank").as("lo_rank"), col("rval").as("lo_v"))
    val hi = rankValues.select(col("vk").as("hi_k"), col("vrank").as("hi_rank"), col("rval").as("hi_v"))
    val interpolated = tq
      .join(broadcast(lo), col("sk") === col("lo_k") && col("rlo") === col("lo_rank"))
      .join(broadcast(hi), col("sk") === col("hi_k") && col("rhi") === col("hi_rank"))
      // lo + (hi - lo) * frac — algebraically the same interpolation
      // as the weighted form lo*(1-frac) + hi*frac, but the EXACT
      // operation sequence DuckDB's quantile_cont uses, so both
      // engines round identically (in particular lo == hi yields lo
      // EXACTLY, where the weighted form can land 1 ulp off — enough
      // to flip integer counts in consumers that compare values
      // against the band, e.g. q36's n_clipped).
      .withColumn("value",
        when(col("rlo") === col("rhi"), col("lo_v")).otherwise(
          col("lo_v") + (col("hi_v") - col("lo_v")) *
            (col("pos") - (col("rlo").cast("double") - 1.0))))

    val qAggs = qs.map { case (nm, _) =>
      max(when(col("qname") === nm, col("value"))).as(nm)
    }
    val mmAggs = minMaxCols.toSeq.flatMap { case (mn, mx) =>
      Seq(max(col("vmin")).as(mn), max(col("vmax")).as(mx))
    }
    val aggs = qAggs ++ mmAggs
    interpolated.groupBy(col("sk").as(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
