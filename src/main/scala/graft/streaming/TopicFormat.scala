package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable wire codec for a topic directory — the Spark analog of
  * the reference's `WithMarshaller`/`WithUnmarshaller` seam
  * (publisher.go:48-51, marshaller.go:24): a publisher/subscriber
  * pair is parameterized by HOW records hit the wire, not only where.
  *
  * Both built-in formats carry the same record schema
  * (`Subscriber.topicSchema`) with the envelope string produced by
  * the shared JSON codec (graftvec.EnvelopeMarshal), so a consumer
  * switches formats without touching its message-handling code. The
  * reference flags a Protobuf marshaller as intended surface
  * (marshaller.go:24 TODO); a binary format would implement this
  * trait and plug into the same publish/subscribe calls.
  */
trait TopicFormat {
  /** Write one publish call's laid-out records under `topicDir`
    * (records arrive shard-partitioned and shard/seq-sorted). */
  def write(records: DataFrame, topicDir: String, mode: String): Unit

  /** Unbounded stream of raw topic records from `topicDir`. */
  def readStream(spark: SparkSession, topicDir: String, maxFilesPerTrigger: Int): DataFrame

  /** One-shot batch read of the records currently on the topic (used
    * by `Subscriber.subscribeFrom(Latest)` to fix the cutoff). */
  def readBatch(spark: SparkSession, topicDir: String): DataFrame
}

/** Columnar topic: parquet files partitioned by shard — the default
  * lake layout (column pruning, predicate pushdown for consumers that
  * filter before unmarshalling). */
object ParquetTopic extends TopicFormat {
  override def write(records: DataFrame, topicDir: String, mode: String): Unit =
    records.write.mode(mode).partitionBy("shard_id").parquet(topicDir)

  override def readStream(spark: SparkSession, topicDir: String,
                          maxFilesPerTrigger: Int): DataFrame =
    spark.readStream
      .schema(Subscriber.topicSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(topicDir)

  override def readBatch(spark: SparkSession, topicDir: String): DataFrame =
    spark.read.schema(Subscriber.topicSchema).parquet(topicDir)
}

/** JSON-lines topic: one envelope per line, shard-partitioned
  * directories — the wire format itself, readable by non-Spark
  * consumers that understand the reference's `MessageData` JSON. */
object JsonLinesTopic extends TopicFormat {
  override def write(records: DataFrame, topicDir: String, mode: String): Unit =
    records.write.mode(mode).partitionBy("shard_id").json(topicDir)

  override def readStream(spark: SparkSession, topicDir: String,
                          maxFilesPerTrigger: Int): DataFrame =
    spark.readStream
      .schema(Subscriber.topicSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(topicDir)

  override def readBatch(spark: SparkSession, topicDir: String): DataFrame =
    spark.read.schema(Subscriber.topicSchema).json(topicDir)
}
