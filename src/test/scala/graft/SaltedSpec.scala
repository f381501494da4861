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

  test("skewAudit's recommended salt reproduces the naive join exactly") {
    // measure → recommend → act: the audit's rec_salt for this
    // suite's 90%-hot key drives joinSkewed, and the salted result
    // must match the naive join bit for bit (salting only changes the
    // exchange distribution, never the answer)
    val audit = Salted.skewAudit(skewed, "user_id").collect()
    assert(audit.nonEmpty, "the 90%-hot key must trip the skew threshold")
    val hot = audit.head
    assert(hot.getLong(0) === 0L)                  // the engineered key
    assert(hot.getAs[Double]("skew") > 4.0)
    val recSalt = hot.getAs[Long]("rec_salt").toInt
    assert(recSalt > 1)

    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val fact = skewed.select("event_id", "user_id")
    val salted = Salted.joinSkewed(fact, dim, "user_id", salt = recSalt)
    val naive = fact.join(dim, "user_id")
    assert(salted.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(salted).count() === 0)
  }

  test("autoJoin closes the audit loop mechanically and equals the naive join on skewed and uniform corpora") {
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))

    // skewed corpus: the audit flags the hot key, autoJoin salts only
    // it — the answer is the naive join, bit for bit (multiset)
    val factSkewed = skewed.select("event_id", "user_id")
    val auto = Salted.autoJoin(factSkewed, dim, "user_id")
    val naive = factSkewed.join(dim, "user_id")
    assert(auto.count() === naive.count())
    assert(auto.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(auto).count() === 0)
    // the audit really split the hot path: rows exist on BOTH branches
    // (hot key salted, cold keys plain) — check via the audit itself
    val audit = Salted.skewAudit(factSkewed, "user_id").collect()
    assert(audit.map(_.getLong(0)).contains(0L))

    // uniform corpus: an empty audit, autoJoin degenerates to exactly
    // the naive result (and its hot branch matches zero rows)
    val factUniform = Tables.events(spark, sf).select("event_id", "user_id")
    assert(Salted.skewAudit(factUniform, "user_id").isEmpty,
      "the uniform corpus must not trip the skew threshold")
    val autoU = Salted.autoJoin(factUniform, dim, "user_id")
    val naiveU = factUniform.join(dim, "user_id")
    assert(autoU.count() === naiveU.count())
    assert(autoU.exceptAll(naiveU).count() === 0)
    assert(naiveU.exceptAll(autoU).count() === 0)
  }
}
