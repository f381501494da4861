package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transport seam for a subscription — WHERE records arrive from,
  * orthogonal to [[TopicFormat]] (HOW they are encoded). The
  * reference's SubscriberBuilder wraps both in one object: the
  * `KinesisClientLibConfiguration` names the transport (stream,
  * region, worker, endpoints — subscriber.go:91-124) and
  * `WithUnmarshaller` names the codec. Here they are two traits so
  * the sandbox file transport and a real Kinesis connector are
  * interchangeable behind the same [[Subscriber]] API: every
  * subscribe/drain entry point takes a SourceFormat, and the built-in
  * [[FileTopicSource]] reproduces today's file-based behavior
  * byte-for-byte.
  *
  * A SourceFormat must deliver records in the [[Subscriber.topicSchema]]
  * shape (shard_id, seq, envelope, ts, partition_key, …) — the KCL
  * record fields the reference's unmarshaller injects as metadata
  * (marshaller.go:28-44). Transports whose native columns differ (the
  * Kinesis connector's `data`/`sequenceNumber`/`approximateArrival
  * Timestamp`) adapt them in [[SourceFormat.records]].
  */
trait SourceFormat {
  /** Wire codec of the records this transport delivers. */
  def codec: TopicFormat

  /** Unbounded stream of raw topic records for `topic`. */
  def records(spark: SparkSession, topic: String): DataFrame

  /** One-shot batch snapshot of the records currently on the topic
    * (used to fix the `Latest` cutoff); None when the topic does not
    * exist yet or the transport cannot snapshot (a pure push source).
    */
  def snapshot(spark: SparkSession, topic: String): Option[DataFrame]
}

/** Today's sandbox transport: a topic is a directory of files written
  * by [[Publisher]]; the file-source checkpoint plays the KCL
  * DynamoDB lease table. `maxFilesPerTrigger` bounds a micro-batch —
  * the analog of the KCL per-call record cap (`MaxRecords`). */
final case class FileTopicSource(codec: TopicFormat = ParquetTopic,
                                 maxFilesPerTrigger: Int = 8) extends SourceFormat {
  override def records(spark: SparkSession, topic: String): DataFrame =
    codec.readStream(spark, topic, maxFilesPerTrigger)

  override def snapshot(spark: SparkSession, topic: String): Option[DataFrame] =
    try Some(codec.readBatch(spark, topic))
    catch { case _: org.apache.spark.sql.AnalysisException => None } // topic not created yet
}

/** The KCL configuration surface the reference's SubscriberBuilder is
  * built around (`NewKinesisClientLibConfig(application, stream,
  * region, workerId)` plus the options its example tunes:
  * endpoints for Localstack, MaxRecords, lease limits/stealing —
  * example/cmd/subscribe/main.go:25-38). `stream` itself is NOT here:
  * exactly as in the reference, the topic passed to `Subscribe`
  * overwrites the configured stream name (subscriber.go:117), so the
  * config is per-application and the topic is per-subscription.
  */
final case class KinesisSourceConfig(
    applicationName: String,
    region: String,
    workerId: String,
    kinesisEndpoint: Option[String] = None,
    dynamoDbEndpoint: Option[String] = None,
    maxRecords: Int = 100,
    maxLeasesForWorker: Option[Int] = None,
    enableLeaseStealing: Boolean = false,
    initialPosition: StartPosition = TrimHorizon)

/** A real-cluster transport: `spark.readStream.format("kinesis")`
  * with the options a Kinesis DSv2 connector takes, mapped 1:1 from
  * the KCL config. The connector jar is not in this sandbox, so
  * `records` fails at source resolution here — but the OPTION MAPPING
  * is pure and spec-tested, and on a cluster with a connector on the
  * classpath this class is the only thing a user changes:
  * `Subscriber.subscribe(spark, KinesisSource(cfg), "my-stream")`.
  *
  * `seq` semantics on this transport: arrival-micros × 4096 + a
  * deterministic sequenceNumber hash tie-break — per-shard monotone
  * at arrival granularity, distinct w.h.p. within a GetRecords batch,
  * stable across replays. Supported seq consumers: ordering (m5),
  * first-arrival dedup (m7), lag/drain math (m16/m21), replay cuts by
  * value (m18's range selection). UNSUPPORTED: anything assuming the
  * file transport's dense contiguous seq (m18's gaplessness audit) —
  * intra-tick order is hash-arbitrary and values are sparse.
  */
final case class KinesisSource(conf: KinesisSourceConfig,
                               codec: TopicFormat = JsonLinesTopic) extends SourceFormat {

  /** Connector options for `topic`, derived from the KCL config the
    * way the reference derives its worker config (subscriber.go:
    * 115-124): topic overwrites the stream name, endpoints pass
    * through for Localstack, the initial position seeds only the
    * first read (a checkpoint always wins, as in KCL). */
  def options(topic: String): Map[String, String] = {
    val position = conf.initialPosition match {
      case TrimHorizon    => "trim_horizon"
      case Latest         => "latest"
      case AtTimestamp(t) => s"at_timestamp:${t.toInstant}"
    }
    Map(
      "streamName" -> topic,
      "region" -> conf.region,
      "consumerName" -> conf.applicationName,
      "workerId" -> conf.workerId,
      "maxRecordsPerFetch" -> conf.maxRecords.toString,
      "startingPosition" -> position,
      "leaseStealing" -> conf.enableLeaseStealing.toString) ++
      conf.kinesisEndpoint.map("endpointUrl" -> _) ++
      conf.dynamoDbEndpoint.map("dynamodbEndpointUrl" -> _) ++
      conf.maxLeasesForWorker.map("maxLeasesPerWorker" -> _.toString)
  }

  override def records(spark: SparkSession, topic: String): DataFrame = {
    val reader = options(topic).foldLeft(spark.readStream.format("kinesis")) {
      case (r, (k, v)) => r.option(k, v)
    }
    // Connector columns → topicSchema shape: the stream carries the
    // envelope bytes in `data` and KCL metadata alongside — the same
    // injection the reference unmarshaller performs (marshaller.go:
    // 28-44). shard_id arrives as "shardId-000000000042"; keep the
    // numeric suffix so downstream per-shard operators (ordering,
    // lag, lease audit) see the same long ids the file transport uses.
    // `seq` can NOT be a cast of `sequenceNumber`: real Kinesis
    // sequence numbers are ~56-digit decimal strings that overflow
    // BIGINT (the cast would silently null every record's seq and
    // break all seq-based operators). The transport's monotone
    // surrogate is the arrival timestamp in microseconds — but every
    // record in one GetRecords batch shares ONE arrival timestamp, so
    // micros alone would tie heavily and seq-distinctness consumers
    // (m16 lag counting, m7 first-arrival dedup ordering) would see
    // collapsed positions. The low 12 bits carry a deterministic
    // xxhash64 of the connector's own `sequenceNumber` as a
    // tie-break: unique-w.h.p. within a batch, stable across replays
    // of the same record, and micros*4096 stays under Long.Max until
    // ~2042. LIMITS, by construction (scaladoc'd on the class):
    // intra-tick ORDER is hash-arbitrary (true sub-tick order lives
    // only in the 56-digit sequenceNumber), and seq is sparse — the
    // file transport's DENSE per-shard seq contract does not hold, so
    // m18's gaplessness check is unsupported over this transport
    // (replay cuts by timestamp instead). Exact resume positions live
    // in the connector's own checkpoint (as in KCL), never here.
    reader.load()
      .select(
        regexp_extract(col("shardId"), "(\\d+)$", 1).cast("long").as("shard_id"),
        lit(-1L).as("batch_id"),
        (unix_micros(col("approximateArrivalTimestamp").cast("timestamp")) * 4096L +
          pmod(xxhash64(col("sequenceNumber")), lit(4096L))).as("seq"),
        lit(-1L).as("event_id"),
        lit(null).cast("string").as("uuid"),
        col("partitionKey").as("partition_key"),
        col("data").cast("string").as("envelope"),
        col("approximateArrivalTimestamp").cast("timestamp").as("ts"))
  }

  /** Kinesis is a pure push transport: there is no cheap batch
    * snapshot to fix a `Latest` cutoff from — the connector's own
    * `startingPosition=latest` does that at the source, which is why
    * [[options]] carries it. */
  override def snapshot(spark: SparkSession, topic: String): Option[DataFrame] = None
}
