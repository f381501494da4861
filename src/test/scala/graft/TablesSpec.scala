package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader-level guards against testdata generator drift: the events.ts
  * physical type changed unannounced between rounds (INT64 nanos →
  * TIMESTAMP(MICROS)) and took 31 operators down at analysis time.
  * These specs pin (a) the adaptive ts branch and (b) the named
  * one-line diagnosis on any future schema flip.
  */
class TablesSpec extends SparkSuite {

  test("events.ts loads as TimestampType regardless of physical parquet type") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType)
    // monotone sanity: real timestamps in a plausible decade, not 1970-era
    // values that a wrong ns/µs branch would produce
    val yr = ev.select(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi")).head
    assert(yr.getInt(0) >= 2000 && yr.getInt(1) <= 2100,
      s"events.ts years ${yr.getInt(0)}..${yr.getInt(1)} look like a unit mismatch")
  }

  test("a schema flip produces one named diagnosis, not a Catalyst mismatch") {
    // simulate the generator renaming/retyping a column: write a fake
    // `nation` with n_name as an int and a missing n_regionkey
    import spark.implicits._
    val dir = tempDir("drift")
    Seq((1, 7), (2, 9)).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val e = intercept[IllegalStateException] { Tables.nation(spark, dir) }
    assert(e.getMessage.contains("testdata schema drift in nation.parquet"))
    assert(e.getMessage.contains("n_name: expected str, found int"))
    assert(e.getMessage.contains("n_regionkey: MISSING"))
  }

  test("the nanos-as-long legacy shape still takes the div-1000 branch") {
    // write an events table with ts as raw INT64 nanoseconds (the
    // pre-round-8 generator's shape) and check the loader truncates to
    // the same microsecond instants a TIMESTAMP(MICROS) file would give
    import spark.implicits._
    val dir = tempDir("evns")
    val microsBase = 1700000000000000L // 2023-11-14T22:13:20 UTC in µs
    Seq(
      (1L, microsBase * 1000L + 999L, 10L, "click", 1.0, "{}"),
      (2L, (microsBase + 5L) * 1000L, 11L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    val micros = got.orderBy("event_id")
      .select(unix_micros(col("ts"))).as[Long].collect()
    assert(micros.toSeq === Seq(microsBase, microsBase + 5L))
  }
}
