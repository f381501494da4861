package graft

import org.apache.spark.sql.functions._

/** Behavioral contracts of the retrieval/decontamination text ops that
  * the row-level DuckDB oracle states but doesn't explain: t12 must
  * catch every engineered leak, t13's posting lists obey their cap and
  * impact order, t14's ranking is monotone in the rounded score.
  */
class TextSpec extends SparkSuite {

  test("t8's packing window is partitioned — no single-partition sort in the plan") {
    val df = SparkEntry.queries("t8_sequence_pack")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the scale-killer shape this guards against: WindowExec with an
    // empty partition spec forces `Exchange SinglePartition` + a
    // global sort. The bucketed design must hash-partition on part_id.
    assert(!plan.contains("Exchange SinglePartition"), plan)
    assert(plan.contains("hashpartitioning(part_id"), plan)
    // every doc packed exactly once, bins respect the budget's greedy
    // fill (bin tokens − its last doc < budget ⟹ no bin starts past
    // the boundary it was opened on)
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).sum === Tables.documents(spark, sf).count())
    assert(rows.forall(r => r.getLong(2) > 0L))
  }

  test("t12 flags every eval source doc and every engineered leak") {
    val out = SparkEntry.queries("t12_decontaminate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evalIds = Tables.documents(spark, sf)
      .filter(col("doc_id") % 40 === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(evalIds.nonEmpty)
    // every source doc surfaces (it contains its own passage)...
    assert(evalIds.forall(out.contains), s"missed sources: ${evalIds.filterNot(out.contains)}")
    // ...and every planted leak (id+200000) is flagged with every gram
    // of its embedded passage matching (min doc = 10 words → passage
    // ≥ 8 words → ≥ 3 six-grams)
    val planted = evalIds.map(_ + 200000L)
    assert(planted.forall(out.contains), s"missed leaks: ${planted.filterNot(out.contains)}")
    assert(planted.forall(id => out(id) >= 3L))
  }

  test("t13 posting lists are capped, impact-ordered, and df-consistent") {
    val rows = SparkEntry.queries("t13_inverted_index")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      // postings ship as a '|'-joined scalar so the correctness gate
      // can row-hash the column (see t13 in TextOps)
      val postings = r.getString(3).split('|').filter(_.nonEmpty).map(_.toLong).toSeq
      assert(postings.size <= 20)
      assert(postings.size == math.min(df, 20L))
      assert(postings.distinct.size == postings.size, s"dup posting for ${r.getString(0)}")
    }
  }

  test("t14 returns k docs in non-increasing rounded-score order") {
    val rows = SparkEntry.queries("t14_bm25_topk")(spark, sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(scores.head > 0.0)
  }
}
