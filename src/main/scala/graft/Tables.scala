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

  /** Expected column → type *category* per table. The test-data
    * generator has changed physical types between rounds (events.ts
    * shipped as INT64-nanos, then TIMESTAMP(MICROS)); categories keep
    * the check drift-tolerant on width (int32 vs int64) while still
    * catching a renamed/dropped column or a wholesale type change with
    * a named error instead of a raw Catalyst DATATYPE_MISMATCH deep in
    * some query's analysis.
    */
  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "str"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "str", "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "int", "c_name" -> "str", "c_nationkey" -> "int",
      "c_acctbal" -> "num", "c_mktsegment" -> "str"),
    "supplier" -> Seq("s_suppkey" -> "int", "s_name" -> "str", "s_nationkey" -> "int",
      "s_acctbal" -> "num"),
    "part" -> Seq("p_partkey" -> "int", "p_name" -> "str", "p_brand" -> "str",
      "p_type" -> "str", "p_size" -> "int", "p_retailprice" -> "num"),
    "orders" -> Seq("o_orderkey" -> "int", "o_custkey" -> "int", "o_orderstatus" -> "str",
      "o_totalprice" -> "num", "o_orderdate" -> "time", "o_orderpriority" -> "str"),
    "lineitem" -> Seq("l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
      "l_linenumber" -> "int", "l_quantity" -> "num", "l_extendedprice" -> "num",
      "l_discount" -> "num", "l_tax" -> "num", "l_returnflag" -> "str",
      "l_linestatus" -> "str", "l_shipdate" -> "time"),
    "events" -> Seq("event_id" -> "int", "ts" -> "time", "user_id" -> "int",
      "event_type" -> "str", "value" -> "num", "props" -> "str"),
    "documents" -> Seq("doc_id" -> "int", "text" -> "str", "lang" -> "str",
      "source" -> "str", "n_chars" -> "int"),
    "embeddings" -> Seq("vec_id" -> "int", "embedding" -> "arr_num", "label" -> "int"))

  private def category(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => "int"
      case FloatType | DoubleType | _: DecimalType => "num"
      case StringType => "str"
      // LongType-nanos for a time column is handled by Tables.events;
      // list it so the raw scan passes the gate before that rewrite.
      case _: TimestampType | _: TimestampNTZType | DateType => "time"
      case ArrayType(e, _) if category(e) == "num" || category(e) == "int" => "arr_num"
      case BinaryType => "bin"
      case _ => dt.simpleString
    }
  }

  /** Named, actionable failure on generator drift: lists expected vs
    * found for every mismatched column at load time, so a schema swap
    * surfaces as ONE diagnosis instead of 31 per-query analysis errors.
    */
  private def checkSchema(name: String, df: DataFrame): DataFrame = {
    expected.get(name).foreach { cols =>
      val found = df.schema.map(f => f.name -> category(f.dataType)).toMap
      val problems = cols.flatMap { case (col, want) =>
        found.get(col) match {
          case None => Some(s"$col: MISSING (expected $want)")
          case Some(got) if got != want &&
            // events.ts may legitimately read as long-nanos pre-rewrite
            !(name == "events" && col == "ts" && got == "int") =>
            Some(s"$col: expected $want, found $got")
          case _ => None
        }
      }
      if (problems.nonEmpty) throw new IllegalStateException(
        s"[graft] testdata schema drift in $name.parquet — ${problems.mkString("; ")}. " +
          s"Full loaded schema: ${df.schema.simpleString}. Update Tables.scala expectations " +
          "or adapt the loader (see Tables.events for the ts precedent).")
    }
    df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    pruneStopped()
    cache.getOrElseUpdate((spark, dir, name),
      checkSchema(name, spark.read.parquet(s"$dir/$name.parquet")))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The test-data generator has shipped `events.ts` as both parquet
    * TIMESTAMP(NANOS) (read as long nanos via the legacy conf) and
    * TIMESTAMP(MICROS) (read natively as TimestampNTZ/Timestamp), and
    * has switched between them unannounced. Branch on the dtype the
    * scan actually produced instead of assuming either: LongType means
    * nanos — truncate to µs; any timestamp type is cast straight to
    * session-local TimestampType (session runs UTC, so the NTZ cast is
    * exact and matches the DuckDB oracle's `ts::TIMESTAMP`).
    */
  def events(s: SparkSession, d: String): DataFrame =
    cache.getOrElseUpdate((s, d, "events.ts"), {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = load(s, d, "events")
      import org.apache.spark.sql.types._
      val tsCol = raw.schema("ts").dataType match {
        // integer `div`, not `/`: double division loses precision at
        // ~1.7e18 ns (> 2^53) and lands ±1 µs off the oracle's truncation.
        case LongType => org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")
        case _: TimestampType | _: TimestampNTZType =>
          org.apache.spark.sql.functions.col("ts").cast(TimestampType)
        case other => throw new IllegalStateException(
          s"events.ts: expected BIGINT (nanos) or TIMESTAMP[_NTZ], found $other — " +
            "the testdata generator changed schema again; extend Tables.events.")
      }
      raw.withColumn("ts", tsCol)
    })
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
