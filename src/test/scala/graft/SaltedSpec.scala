package graft

import org.apache.spark.sql.functions._
import graft.operators.Salted

class SaltedSpec extends SparkSuite {

  // heavily skewed: user 0 owns ~90% of events
  private lazy val skewed = Tables.events(spark, sf)
    .withColumn("user_id", when(col("event_id") % 10 =!= 0, 0L).otherwise(col("user_id")))

  test("countDistinctSkewed equals naive countDistinct on a skewed key") {
    val salted = Salted.countDistinctSkewed(skewed, "user_id", "event_type")
    val naive = skewed.groupBy("user_id")
      .agg(countDistinct(col("event_type")).as("n_distinct_event_type"))
    assert(salted.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(salted).count() === 0)
  }

  test("joinSkewed equals naive join on a skewed fact side") {
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val salted = Salted.joinSkewed(skewed.select("event_id", "user_id"), dim, "user_id")
    val naive = skewed.select("event_id", "user_id").join(dim, "user_id")
    assert(salted.count() === naive.count())
    assert(salted.exceptAll(naive).count() === 0)
  }
}
