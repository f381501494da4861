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

  test("lshStarEdges ≡ lshPairsFrom under components; linear, not quadratic, on a mega-clique") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val Dedup = graft.queries.Dedup
    // 200 exact copies — identical signatures, so ONE band bucket of
    // 200 in every band (the boilerplate mega-clique the round-16
    // sf10 capture hit at 100-way: C(100,2)×bands rows through the
    // clique join's distinct, >70 GB of spill in one run) — plus 50
    // mutually-distinct docs
    val copies = (0 until 200).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val distincts = (200 until 250).map(i =>
      (i.toLong, s"unique$i words nothing shared here w${i * 7} w${i * 13} tail$i end$i"))
    val docs = (copies ++ distincts).toDF("doc_id", "text")
    val sigs = Dedup.kmSignatures(docs, materialize = true)
    val clique = Dedup.lshPairsFrom(sigs)
    val star = Dedup.lshStarEdges(sigs)
    def comps(edges: org.apache.spark.sql.DataFrame) =
      Components.connected(edges.select(col("doc_a").as("node"), col("doc_b").as("nbr")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical transitive closure: star edges are a subset of clique
    // edges, and every clique edge's endpoints meet through the hub
    assert(comps(star) == comps(clique))
    // the cost asymmetry IS the point: within the 200-copy bucket the
    // clique join emits C(200,2) pairs, the star exactly n−1
    val inCopies = col("doc_a") < 200L && col("doc_b") < 200L
    assert(clique.filter(inCopies).count() == 19900L)
    assert(star.filter(inCopies).count() == 199L)
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
