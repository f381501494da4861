package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.functions.Portable

/** Incremental training-data curation: the batch prep pipeline (p1 —
  * exact dedup → quality filter → token accounting) re-expressed over
  * a live subscription, so a corpus keeps growing without ever
  * re-scanning what was already curated.
  *
  * The dedup is content-addressed (md5 of normalized text) and
  * bounded by the watermark: a duplicate document is dropped while a
  * redelivery/copy could still plausibly arrive, exactly like
  * `Subscriber.exactlyOnce` bounds uuid dedup. Quality features come
  * from `graft.queries.Pipeline.withQuality`, so streaming and batch
  * curation apply the SAME score. Progress is checkpointed — a
  * crashed curator resumes after its last finished micro-batch.
  */
object DataPrep {

  /** Curate a message stream (shape of `Subscriber.subscribe`, with
    * the document text as the payload) into a parquet corpus dir. */
  def curate(msgs: DataFrame, outDir: String, checkpointDir: String,
             minQuality: Double = 0.5,
             watermarkDelay: String = "10 minutes"): StreamingQuery =
    graft.queries.Pipeline.withQuality(
      msgs.select(
          col("uuid").cast("long").as("doc_id"),
          col("payload").cast("string").as("text"),
          col("ts"))
        .withColumn("h", Portable.md5hex(Portable.normText(col("text"))))
        .withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark("h"))
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"), col("h"), col("n_words"), col("quality"),
        col("text"), col("ts"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** One ingest step of segment-level dedup — t21's incremental form,
    * d13's disposition pattern at segment granularity. `store` is the
    * persistent digest table (`h`: one 16-byte digest per segment
    * ever seen); `batch` is an incoming (doc_id, text) micro-batch.
    * A segment is dup when the store already has it OR an earlier doc
    * in the SAME batch carries it (first-arrival, d13's batch
    * window). Returns the per-doc report (segments, dup segments,
    * ratio, keep) and the digests this batch adds. The store records
    * every segment SEEN — rejected docs' segments included — so a
    * re-upload of even a rejected doc flags fully next time. Only
    * digests shuffle; segment text never leaves the map side, and the
    * driver loop (foreachBatch in a stream, a scheduler in nightly
    * ingest) persists the returned delta — the store is durable
    * storage, not stream-engine state. */
  def segmentDedupStep(store: DataFrame, batch: DataFrame,
                       maxDupRatio: Double = 0.5): (DataFrame, DataFrame) = {
    val segs = graft.queries.TextOps.segmentRows(batch)
    val firstDoc = segs.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    val report = segs
      .join(store.select(col("h"), lit(true).as("in_store")), Seq("h"), "left")
      .join(firstDoc, Seq("h"))
      .withColumn("is_dup",
        coalesce(col("in_store"), lit(false)) || col("first_doc") < col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_segs"))
      .withColumn("dup_ratio",
        round(col("n_dup_segs").cast("double") / col("n_segs"), 6))
      .withColumn("keep", col("dup_ratio") <= maxDupRatio)
    val added = segs.select(col("h")).distinct()
      .join(store, Seq("h"), "left_anti")
    (report, added)
  }
}
