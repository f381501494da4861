package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-checked loaders for the driver-generated parquet tables
  * (see TESTDATA.md). All operators take the table dir so the same
  * code runs at any scale factor — and, on a real cluster, against
  * a 100 TB lake path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized analyzed relations (a minimal catalog): `spark.read
    * .parquet` lists files and reads footers for schema inference on
    * every call, which recurs per query per table and is pure driver
    * overhead. The tables are immutable inputs, so the same analyzed
    * DataFrame is safely reused for the life of the session. */
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Drop entries whose session has stopped — long-lived JVMs that
    * cycle many sessions (test suites, notebook kernels) would
    * otherwise retain every stopped session's analyzed plans (and the
    * sessions themselves) forever. O(entries) per load, and entries
    * number in the tens. */
  private def pruneStopped(): Unit =
    cache.keysIterator.foreach { k =>
      if (k._1.sparkContext.isStopped) cache.remove(k)
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    pruneStopped()
    cache.getOrElseUpdate((spark, dir, name),
      spark.read.parquet(s"$dir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 rejects by default. Read it as long nanos (legacy conf)
    * and truncate to a proper microsecond TimestampType — the oracle
    * mirrors with `ts::TIMESTAMP` (ns→µs truncation) on its side.
    */
  def events(s: SparkSession, d: String): DataFrame =
    cache.getOrElseUpdate((s, d, "events.ts"), {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // integer `div`, not `/`: double division loses precision at
      // ~1.7e18 ns (> 2^53) and lands ±1 µs off the oracle's truncation.
      load(s, d, "events")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    })
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
