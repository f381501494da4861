package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation to a
  * FIXPOINT — the convergent form of the bounded two-round collapse
  * d8 uses (exact there only for diameter ≤ 2 graphs).
  *
  * Algorithm (the MapReduce-CC shape of Rastogi et al. 2013): every
  * node starts labeled with itself; each round a node adopts the min
  * label among itself and its neighbors; stop when no label changed.
  * Rounds needed = graph diameter — near-dup graphs are near-cliques
  * (1-3 rounds), while pathological chains converge in O(diameter).
  *
  * Scale posture per round: ONE shuffle of the edge list joined
  * against a (node, label) relation — state is one long per node, no
  * driver-side graph, no collect. The edge list and each round's
  * labels are `localCheckpoint`ed: edges because every round rescans
  * them (without it the upstream plan — here an LSH band join —
  * would replan per round), labels because the loop would otherwise
  * double the lineage each round. On a real cluster the same loop
  * checkpoints to reliable storage (GraphX/GraphFrames practice);
  * local[n] keeps the blocks in executor memory.
  */
object Components {

  /** Connected components of an undirected graph.
    *
    * @param edges   (node, nbr) pairs; treated as undirected (both
    *                directions are unioned in, so callers may pass
    *                each edge once in either orientation)
    * @param maxIter safety bound on propagation rounds
    * @return (node, comp_id) — comp_id = min node id reachable
    */
  def connected(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("node"), col("nbr"))
      .unionAll(edges.select(col("nbr").as("node"), col("node").as("nbr")))
      .unionAll(edges.select(col("node"), col("node").as("nbr")))
      .unionAll(edges.select(col("nbr").as("node"), col("nbr").as("nbr")))
      .distinct()
      .localCheckpoint()
    var labels = sym.groupBy(col("node")).agg(min(col("nbr")).as("lbl"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = sym
        .join(labels.select(col("node").as("nbr"), col("lbl")), "nbr")
        .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("lbl", "prev"), "node")
        .filter(col("lbl") < col("prev")).isEmpty
      labels = next
      iter += 1
    }
    labels.select(col("node"), col("lbl").as("comp_id"))
  }
}
