package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling harness (test scope — not part of the library
  * jar): times named plan variants the same way Bench does
  * (toRdd.count), printing per-variant seconds so slow stages can be
  * attributed.
  * Usage: Test/runMain graft.Probe [sfDir] [nameSubstring]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse(sys.error("pass sfDir or set SPARK_GRAFT_SF_DIR"))
    val only = args.drop(1).headOption.getOrElse("")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Envelope

    def time(name: String)(df: => DataFrame): Unit = if (name.contains(only)) {
      // warm once, then time two runs — each on a FRESH DataFrame
      // (re-counting the same one reuses shuffle outputs and times
      // only the final stage, wildly under-reporting shuffle queries)
      df.queryExecution.toRdd.count()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s ${times.min}%.3f s  (runs: ${times.map(t => f"$t%.3f").mkString(", ")})")
    }

    val msgs = Envelope.messages(spark, sfDir)

    time("m5_full")(SparkEntry.queries("m5_per_shard_order")(spark, sfDir))
    time("m5_no_orderby")(Envelope.withShardSeq(msgs)
      .select(col("event_id"), col("shard_id"), col("seq")))
    time("m5_messages_only")(msgs)
    time("m5_shard_only")(msgs.withColumn("shard_id",
      Envelope.shardId(col("partition_key"))))
    time("m4_full")(SparkEntry.queries("m4_publish_batches")(spark, sfDir))
    time("m6_full")(SparkEntry.queries("m6_checkpoint_resume")(spark, sfDir))
    time("m2_full")(SparkEntry.queries("m2_unmarshal")(spark, sfDir))
    time("q21_full")(SparkEntry.queries("q21_percentiles")(spark, sfDir))
    time("q12_full")(SparkEntry.queries("q12_distinct_agg")(spark, sfDir))
    time("d3_full")(SparkEntry.queries("d3_lsh_pairs")(spark, sfDir))
    time("d4_full")(SparkEntry.queries("d4_ngram_jaccard")(spark, sfDir))

    import graft.functions.Portable
    val docs = Tables.documents(spark, sfDir)
    time("d1_full")(SparkEntry.queries("d1_exact_dedup")(spark, sfDir))
    time("d1_scan_only")(docs.select(col("doc_id")))
    time("d1_text_only")(docs.select(col("doc_id"), length(col("text")).as("n")))
    time("d1_norm_only")(docs.select(col("doc_id"),
      length(Portable.normText(col("text"))).as("n")))
    time("d1_hash_only")(docs.select(col("doc_id"),
      Portable.md5hex(Portable.normText(col("text"))).as("h")))
    // round-10 heavy queries, with stage variants for attribution
    time("q46_full")(SparkEntry.queries("q46_mad_outliers")(spark, sfDir))
    time("q47_full")(SparkEntry.queries("q47_sketch_outliers")(spark, sfDir))
    time("d20_full")(SparkEntry.queries("d20_span_dedup")(spark, sfDir))
    time("d21_full")(SparkEntry.queries("d21_band_layout")(spark, sfDir))
    time("p7_full")(SparkEntry.queries("p7_dedup_cascade")(spark, sfDir))
    time("p8_full")(SparkEntry.queries("p8_corpus_card")(spark, sfDir))
    time("a26_full")(SparkEntry.queries("a26_adaptive_nprobe")(spark, sfDir))
    time("a27_full")(SparkEntry.queries("a27_opq_serve")(spark, sfDir))
    time("mm12_full")(SparkEntry.queries("mm12_payload_decode")(spark, sfDir))
    time("d20_windows_only")(graft.queries.Dedup.spanWindows(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), graft.functions.Portable.words(col("text")).as("w"))))

    time("a1_full")(SparkEntry.queries("a1_knn_brute")(spark, sfDir))
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", graft.functions.Vec.norm(col("emb")))
    time("a1_vecs_only")(vecs)
    time("a1_join_nowin") {
      val probes = vecs.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"), col("nrm").as("p_nrm"))
      vecs.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          (graft.functions.Vec.dot(col("p_emb"), col("emb")) / (col("p_nrm") * col("nrm"))).as("cosine"))
    }

    spark.stop()
  }
}
