package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation to a
  * FIXPOINT — the convergent form of the bounded two-round collapse
  * (Dedup.dupClustersTwoRound, exact only for diameter ≤ 2 graphs;
  * the former d8 registry entry, folded into d9 in round 16).
  *
  * Algorithm (the MapReduce-CC shape of Rastogi et al. 2013): every
  * node starts labeled with itself; each round a node adopts the min
  * label among itself and its neighbors; stop when no label changed.
  * Rounds needed = graph diameter — near-dup graphs are near-cliques
  * (1-3 rounds), while pathological chains converge in O(diameter).
  *
  * Cost shape (round 12 rework — the round-11 form paid TWO extra
  * Spark jobs per round: a localCheckpoint of `next` AND a separate
  * next⋈labels convergence join):
  *  - Labels are SEEDED with two unchecked propagation rounds — the
  *    same work the bounded two-round collapse does — so the near-clique
  *    graphs this engine actually feeds (LSH candidate pairs among
  *    exact-dup survivors) arrive at the checked loop already
  *    converged and pay exactly ONE checked round.
  *  - Each checked round is ONE aggregation job: the symmetrized
  *    edge list always contains the (node, node) self-loop, so the
  *    join against labels-on-nbr yields the node's OWN prior label
  *    on that row, and the groupBy emits min-label and prior-label
  *    together (`min(lbl)`, `min(lbl) when nbr=node`). Convergence
  *    detection is then a filter over the just-checkpointed
  *    in-memory blocks — no second join, no replanned lineage.
  *  - The label relation is BROADCAST into the per-round join by
  *    default: every caller in this engine passes a candidate-sized
  *    graph (pairs that survived banding among exact-survivors —
  *    orders of magnitude below corpus size), so shipping the label
  *    frame beats shuffling the edge list every round. A
  *    corpus-sized graph passes broadcastLabels=false and gets the
  *    shuffle join.
  *
  * The edge list is `localCheckpoint`ed because every round rescans
  * it (without it the upstream plan — here an LSH band join — would
  * replan per round); each round's labels likewise, so lineage stays
  * flat. On a real cluster the same loop checkpoints to reliable
  * storage (GraphX/GraphFrames practice); local[n] keeps the blocks
  * in executor memory.
  */
object Components {

  /** Connected components of an undirected graph.
    *
    * @param edges   (node, nbr) pairs; treated as undirected (both
    *                directions are unioned in, so callers may pass
    *                each edge once in either orientation)
    * @param maxIter safety bound on CHECKED propagation rounds
    * @param broadcastLabels ship the (node,label) relation broadcast
    *                into each round's join (right for candidate-sized
    *                graphs — the engine's dedup callers); false for
    *                corpus-sized graphs
    * @return (node, comp_id) — comp_id = min node id reachable
    * @throws IllegalStateException if maxIter checked rounds pass
    *                without convergence: an unconverged label table
    *                would silently disagree with the exact recursive
    *                reachability the DuckDB oracles compute, so the
    *                failure must be loud (ADVICE r11)
    */
  def connected(edges: DataFrame, maxIter: Int = 20,
                broadcastLabels: Boolean = true): DataFrame = {
    val sym = edges.select(col("node"), col("nbr"))
      .unionAll(edges.select(col("nbr").as("node"), col("node").as("nbr")))
      .unionAll(edges.select(col("node"), col("node").as("nbr")))
      .unionAll(edges.select(col("nbr").as("node"), col("nbr").as("nbr")))
      .distinct()
      .localCheckpoint()
    def asNbr(labels: DataFrame): DataFrame = {
      val r = labels.select(col("node").as("nbr"), col("lbl"))
      if (broadcastLabels) broadcast(r) else r
    }
    // seed = the bounded two-round collapse (min over direct nbrs, then one
    // unchecked propagation) — exact already for diameter <= 2
    var labels = sym.groupBy(col("node")).agg(min(col("nbr")).as("lbl"))
      .localCheckpoint()
    labels = sym.join(asNbr(labels), "nbr")
      .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // one job: propagate AND carry each node's prior label (read off
      // the self-loop row) so the convergence probe below is a scan of
      // the checkpointed blocks, not a join
      val agg = sym.join(asNbr(labels), "nbr")
        .groupBy(col("node"))
        .agg(min(col("lbl")).as("nl"),
          min(when(col("nbr") === col("node"), col("lbl"))).as("prev"))
      // POINTER DOUBLING (round 18, the sf30 third-decade catch):
      // neighbor-only min propagation converges in O(diameter)
      // rounds, and at 300 scale replicas the LSH star-edge graph's
      // hub chains exceeded the 20-round bound (d9/p7 threw the
      // loud-failure guard mid-capture). Each round now ALSO adopts
      // the best label's OWN label — the standard shortcutting step:
      // labels are node ids, so one labels⋈labels join keyed on the
      // candidate label halves every label chain per round, and the
      // fixpoint is reached in O(log diameter) rounds (the 20-round
      // bound now covers diameters past 10⁶). The extra join is
      // labels-sized and rides the same broadcast decision as the
      // propagation join; the fixpoint itself is unchanged (labels
      // stay monotone-decreasing within the component, minimum wins),
      // so every oracle and spec equality holds as before.
      val short = labels.select(col("node").as("nl"), col("lbl").as("ll"))
      val agg2 = agg
        .join(if (broadcastLabels) broadcast(short) else short, Seq("nl"), "left")
        .select(col("node"),
          least(col("nl"), coalesce(col("ll"), col("nl"))).as("lbl"),
          col("prev"))
        .localCheckpoint()
      converged = agg2.filter(col("lbl") < col("prev")).isEmpty
      labels = agg2.select(col("node"), col("lbl"))
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"Components.connected: no fixpoint after $maxIter checked rounds " +
          "(graph diameter exceeds the bound); raise maxIter — an " +
          "unconverged label table would silently diverge from the exact oracle")
    labels.select(col("node"), col("lbl").as("comp_id"))
  }
}
