package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Envelope

/** Spark-native Publisher (reference publisher.go).
  *
  * The reference's `Publish(topic, messages...)` marshals each message
  * and ships ≤500-record `PutRecords` batches, routed by partition
  * key. Here the "topic" is a parquet directory laid out by shard —
  * `topicDir/shard_id=N/...` — and a publish call writes one batch of
  * messages with their envelope, shard and per-shard sequence. The
  * 500 cap becomes a property of the layout (`batch_id` groups of
  * ≤500 consecutive seqs per shard) instead of a client-side error:
  * at 100 TB the publisher is a distributed write, so the cap is
  * enforced per-shard-partition, not per driver call.
  */
object Publisher {
  val MaxBatch = 500 // publisher.go:14 maxMessages

  /** Shared topic layout: marshal + route + sequence + batch ids,
    * shard-partitioned and shard/seq-sorted. */
  private def layout(msgs: DataFrame): DataFrame = {
    val seqd = Envelope.withShardSeq(msgs)
    seqd
      .withColumn("envelope", Envelope.marshalled(seqd))
      .withColumn("batch_id", ((col("seq") - 1L) / MaxBatch.toLong).cast("long"))
      .select(col("shard_id"), col("batch_id"), col("seq"),
        col("event_id"), col("uuid"), col("partition_key"),
        col("envelope"), col("ts"))
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("seq"))
  }

  /** Marshal + route + sequence + write one publish call's messages. */
  def publish(msgs: DataFrame, topicDir: String, mode: String = "append"): Unit =
    layout(msgs).write.mode(mode).partitionBy("shard_id").parquet(topicDir)

  /** JSON-lines topic variant — the envelope travels as the wire
    * format itself (one JSON record per line, shard-partitioned
    * directories), interoperable with non-Spark consumers that read
    * the reference's `MessageData` envelope directly. */
  def publishJson(msgs: DataFrame, topicDir: String, mode: String = "append"): Unit =
    layout(msgs).write.mode(mode).partitionBy("shard_id").json(topicDir)

  /** Streaming publisher: each micro-batch becomes one `publish` call
    * (the reference's `Publish(topic, msgs...)` is per-call batching,
    * so per-micro-batch sequences/batch ids mirror its semantics).
    * Progress is durable at `checkpointDir` — a crashed publisher
    * resumes without re-publishing finished micro-batches.
    */
  /** Compact a topic in place: streaming publishes accumulate many
    * small files per shard; rewrite each shard partition as few files
    * while preserving every record and the shard layout. At lake
    * scale this runs per shard-partition (no global shuffle — the
    * data is already partitioned on disk).
    */
  def compact(spark: SparkSession, topicDir: String, filesPerShard: Int = 1): Unit = {
    val tmp = topicDir.stripSuffix("/") + ".compact"
    spark.read.parquet(topicDir)
      .repartition(filesPerShard, col("shard_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(topicDir)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  def publishStream(msgs: DataFrame, topicDir: String, checkpointDir: String): StreamingQuery =
    msgs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        publish(batch.toDF(), topicDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
