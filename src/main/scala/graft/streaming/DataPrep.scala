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
}
