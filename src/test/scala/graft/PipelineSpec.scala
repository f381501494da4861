package graft

import org.apache.spark.sql.functions._
import graft.operators.MediaDecode

/** Behavior the DuckDB oracle can't check: ANN recall quality and the
  * mapPartitions media-decode batch path.
  */
class PipelineSpec extends SparkSuite {

  private def neighborSets(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf)
      .select("probe_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }

  test("a2 LSH knn recalls a useful fraction of a1 exact knn") {
    val exact = neighborSets("a1_knn_brute")
    val lsh = neighborSets("a2_knn_lsh")
    // LSH searches one 8-bit bucket; on 500 random vectors expect
    // imperfect but nonzero overlap, and never a non-probe result set.
    assert(lsh.keySet.subsetOf(exact.keySet))
    val recalls = exact.keys.toSeq.map { p =>
      val hit = lsh.getOrElse(p, Set.empty) & exact(p)
      hit.size.toDouble / exact(p).size
    }
    assert(recalls.sum / recalls.size > 0.0, s"zero recall: $recalls")
  }

  test("a6 multi-probe recall dominates single-bucket LSH recall") {
    val exact = neighborSets("a1_knn_brute")
    val single = neighborSets("a2_knn_lsh")
    val multi = neighborSets("a6_knn_multiprobe")
    def recall(sets: Map[Long, Set[Long]]): Double = {
      val rs = exact.keys.toSeq.map { p =>
        (sets.getOrElse(p, Set.empty) & exact(p)).size.toDouble / exact(p).size
      }
      rs.sum / rs.size
    }
    // Hamming-1 expansion only grows the candidate set, so recall
    // cannot drop (a displacing candidate must itself be a true
    // neighbor); with 16 buckets it should strictly improve.
    assert(recall(multi) >= recall(single),
      s"multi=${recall(multi)} single=${recall(single)}")
  }

  test("a3 IVF knn searches only nprobe cells but still finds near neighbors") {
    val exact = neighborSets("a1_knn_brute")
    val ivf = neighborSets("a3_ivf_knn")
    assert(ivf.nonEmpty)
    val recalls = exact.keys.toSeq.map { p =>
      (ivf.getOrElse(p, Set.empty) & exact(p)).size.toDouble / exact(p).size
    }
    assert(recalls.sum / recalls.size > 0.2, s"IVF recall too low: $recalls")
  }

  test("a5 Lloyd refinement does not lose vectors and keeps members coherent") {
    val out = SparkEntry.queries("a5_ivf_refine")(spark, sf).collect()
    assert(out.nonEmpty)
    // every vector lands in exactly one refined cell
    assert(out.map(_.getLong(1)).sum === Tables.embeddings(spark, sf).count())
    // members should sit closer to their refined centroid than random
    // pairs do in this corpus (natural max cosine ≈ 0.48)
    val weightedMean = out.map(r => r.getLong(1) * r.getDouble(2)).sum /
      out.map(_.getLong(1)).sum
    assert(weightedMean > 0.1, s"mean member-centroid cosine too low: $weightedMean")
  }

  test("media decodeBatch preserves rows and derives stable metadata") {
    import spark.implicits._
    val media = Tables.documents(spark, sf)
      .select(col("doc_id").as("docId"), col("text").cast("binary").as("payload"))
      .as[MediaDecode.Media]
    val out = MediaDecode.decodeBatch(media).collect()
    assert(out.length === 500)
    assert(out.forall(_.ok))
    assert(out.forall(m => m.width >= 0 && m.width < 1920 && m.height >= 0 && m.height < 1080))
    // deterministic: same input → same metadata
    val again = MediaDecode.decodeBatch(media).collect()
    assert(out.sortBy(_.docId).toSeq === again.sortBy(_.docId).toSeq)
  }

  test("d6 finds exactly the synthesized scaled near-dupes") {
    val pairs = SparkEntry.queries("d6_embedding_dup")(spark, sf).collect()
    // every 25th vec_id gets a scaled twin at +100000
    val expected = (0 until 500 by 25).map(i => (i.toLong, i + 100000L)).toSet
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    assert(pairs.forall(_.getDouble(3 - 1) >= 0.95))
  }
}
