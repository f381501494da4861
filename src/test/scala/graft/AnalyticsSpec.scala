package graft

import org.apache.spark.sql.execution.ExplainMode

class AnalyticsSpec extends SparkSuite {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or a documented rows-only check") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("q2 filter and projection reach the parquet scan") {
    val df = SparkEntry.queries("q2_filter_project")(spark, sf)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters"), "no filter pushdown in:\n" + plan)
    assert(plan.contains("IsNotNull(l_quantity)") || plan.contains("GreaterThan(l_quantity"),
      "quantity predicate not pushed:\n" + plan)
    // column pruning: scan must not read all 16 lineitem columns
    assert(!plan.contains("l_tax"), "scan reads unneeded columns:\n" + plan)
  }

  test("q4 dim join broadcasts") {
    val df = SparkEntry.queries("q4_broadcast_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q7 topk plans as TakeOrderedAndProject (no global sort)") {
    val df = SparkEntry.queries("q7_topk")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("round-8 operators keep their scale shapes in the physical plan") {
    // q43: both windows partition by user_id — a sessionizer that
    // fell back to a global window would single-partition the facts
    val q43 = SparkEntry.queries("q43_sessionize")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!q43.contains("SinglePartition"), q43)
    // d17/t21/a18: candidate generation is always keyed — no
    // cartesian pair space anywhere
    for (n <- Seq("d17_containment", "t21_segment_dedup", "a18_ivf_pq_serve",
        "q44_event_funnel", "mm9_shard_pack", "p5_mix_build")) {
      val plan = SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$n plans a cartesian:\n$plan")
      assert(!plan.contains("SinglePartition Exchange"), s"$n single-partitions:\n$plan")
    }
    // mm9's shard-count table and p5's weight table attach by
    // broadcast — the manifest never shuffles the blob/doc side twice
    for (n <- Seq("mm9_shard_pack", "p5_mix_build")) {
      val plan = SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$n lost its broadcast:\n$plan")
    }
  }

  test("round-9 operators keep their scale shapes in the physical plan") {
    // no cartesian pair space and no data-sized single-partition
    // funnel in any of the new operators (keyless 1-row total merges
    // are the only SinglePartition allowed and carry no data)
    // (BroadcastNestedLoopJoin is allowed ONLY as the 1-row stats
    // attach — the broadcast-cross idiom m23/q45/d19/t23 use for
    // fleet totals; an unkeyed join of two DATA-sized sides would be
    // CartesianProduct, which stays banned)
    for (n <- Seq("m23_shard_cost", "q45_quantile_sketch", "d19_bloom_probe",
        "a23_filtered_knn", "a24_nprobe_sweep", "t23_token_fertility",
        "mm10_shard_checksum", "t8_sequence_pack")) {
      val plan = SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$n plans a cartesian:\n$plan")
    }
    // q45 walks the packed histogram array-natively: the sketch path
    // must carry the interpolation inside an `aggregate(hb, ...)`
    // lambda, not a cumsum window over the bins (the rejected design);
    // the only windows in the full plan belong to the exact-audit
    // side's Percentiles operator, which partitions by its group key
    val q45 = SparkEntry.queries("q45_quantile_sketch")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q45.contains("aggregate(hb"), q45)
    // a23's label filter rides the routed-cell candidate join: the
    // plan's candidate BroadcastHashJoin must hash on BOTH cell and
    // label (the pushdown claim — candidates shrink at the join key,
    // not in a post-filter). The only nested-loop joins allowed are
    // the tiny broadcast centroid crosses a3 also plans.
    val a23 = SparkEntry.queries("a23_filtered_knn")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(a23.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("cell") && l.contains("label")), a23)
    // d19's bloom probe joins the ≤1024-row bit set by broadcast
    val d19 = SparkEntry.queries("d19_bloom_probe")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(d19.contains("BroadcastHashJoin"), d19)
  }

  test("round-10 operators keep their scale shapes in the physical plan") {
    for (n <- Seq("q46_mad_outliers", "t25_code_detect", "d20_span_dedup",
        "a26_adaptive_nprobe", "mm12_payload_decode", "p7_dedup_cascade")) {
      val plan = SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$n plans a cartesian:\n$plan")
    }
    // d20's interval-merge windows partition by doc_id — a global
    // window would single-partition the whole window stream
    val d20 = SparkEntry.queries("d20_span_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!d20.contains("Exchange SinglePartition"), d20)
    assert(d20.contains("hashpartitioning(doc_id"), d20)
    // t25 and mm12 are one-scan map passes: nothing shuffles before
    // the output sort (range partitioning is the only Exchange)
    for (n <- Seq("t25_code_detect", "mm12_payload_decode")) {
      val plan = SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString
      val ex = plan.linesIterator.count(_.contains("Exchange"))
      val range = plan.linesIterator.count(_.contains("Exchange rangepartitioning"))
      assert(ex === range, s"$n shuffles beyond the output sort:\n$plan")
    }
    // q46's median/MAD bands broadcast back onto the event rows — the
    // fact side never reshuffles on the group key
    val q46 = SparkEntry.queries("q46_mad_outliers")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q46.contains("BroadcastHashJoin"), q46)
    // second round-10 batch: retention sizing, band tuning, span
    // decontamination — keyed joins only
    for (n <- Seq("m24_retention_sizing", "d21_band_layout", "t26_span_decontam",
        "a27_opq_serve", "q47_sketch_outliers", "p8_corpus_card",
        "q48_series_topk")) {
      val plan = SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$n plans a cartesian:\n$plan")
    }
    // t26's eval window set attaches to the corpus windows by
    // broadcast — the 100 TB side never shuffles on the digest
    val t26 = SparkEntry.queries("t26_span_decontam")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(t26.contains("BroadcastHashJoin"), t26)
  }

  test("native-kernel queries stay map-side: only the output sort shuffles") {
    // These compute their whole result per-row (one-pass kernels /
    // codegen builtins); the only exchange allowed is the final
    // orderBy's range partitioning. A second exchange means someone
    // reintroduced an explode/window/groupBy data shuffle.
    for (n <- Seq("d2_minhash_sig", "d5_simhash", "t4_fingerprint",
        "t7_dup_words", "mm3_chunk_manifest", "m3_shard_assign")) {
      val plan = SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString
      val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
      assert(exchanges <= 1, s"$n has $exchanges exchanges:\n$plan")
    }
  }

  test("a4 hard-negative mining broadcasts the probe side") {
    val plan = SparkEntry.queries("a4_cross_label_nn")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
  }

  test("d4 joins candidate shingle sets by broadcast, not shuffle") {
    val plan = SparkEntry.queries("d4_ngram_jaccard")(spark, sf)
      .queryExecution.executedPlan.toString
    // the two candidate→shingle-set joins must be broadcast joins —
    // shuffling the sh arrays would move O(corpus) bytes at scale
    assert(plan.sliding("BroadcastHashJoin".length)
      .count(_ == "BroadcastHashJoin") >= 2, plan)
  }
}
