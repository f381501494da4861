package graft

import graft.operators.Components

class ComponentsSpec extends SparkSuite {

  test("label propagation converges past the two-round horizon (10-chain)") {
    import spark.implicits._
    // a path graph 1-2-…-10: min-label needs ~diameter rounds to
    // reach the far end, so the bounded two-round collapse
    // (Dedup.dupClustersTwoRound) CANNOT solve it — the fixpoint loop must
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("node", "nbr")
    val island = Seq((20L, 21L)).toDF("node", "nbr")
    val labels = Components.connected(chain.unionAll(island))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 10L).forall(labels(_) == 1L), s"chain labels: $labels")
    assert(labels(20L) == 20L && labels(21L) == 20L)
    assert(labels.size == 12)
  }

  test("exceeding maxIter fails loudly instead of returning unconverged labels") {
    import spark.implicits._
    // a 30-chain needs ~diameter propagation rounds; with the checked
    // loop capped at 1 (after the 2-round seed) the labels cannot have
    // converged, and a silent return would diverge from the exact
    // recursive-reachability oracle — the contract is to throw
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("node", "nbr")
    val ex = intercept[IllegalStateException] {
      Components.connected(chain, maxIter = 1)
    }
    assert(ex.getMessage.contains("no fixpoint"))
  }

  test("edge orientation does not matter") {
    import spark.implicits._
    val fwd = Seq((1L, 2L), (2L, 3L)).toDF("node", "nbr")
    val rev = Seq((2L, 1L), (3L, 2L)).toDF("node", "nbr")
    val a = Components.connected(fwd).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Components.connected(rev).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("d9 fixpoint ≡ the demoted two-round collapse on the corpus, keeper semantics included") {
    // same pair graph ⇒ identical (keeper, size, max member) on a
    // diameter-≤2 corpus; this pins d9's fixpoint (which absorbed the
    // d8 registry entry in round 16) to the known-green bounded
    // collapse it generalizes — dupClustersTwoRound stays the
    // latency-bounded building block and must not drift
    val bounded = graft.queries.Dedup
      .dupClustersTwoRound(graft.queries.Dedup.lshPairs(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val d9 = SparkEntry.queries("d9_dup_components")(spark, sf)
      .select("comp_id", "n_members", "max_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(d9 == bounded)
  }
}
