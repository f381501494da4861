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
}
