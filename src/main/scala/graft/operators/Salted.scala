package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe shapes for hot keys.
  *
  * At 100 TB a handful of hot keys (one chatty user, one dominant
  * partition key) can pin a whole stage on one reducer. AQE's skew
  * handling (on by default via GraftSession) fixes storage skew in
  * sort-merge joins at runtime; these operators fix the cases AQE
  * can't: aggregation state skew and broadcast-unfriendly hot-key
  * joins. Results are identical to the naive shapes — only the
  * exchange distribution changes.
  */
object Salted {

  /** Exact distinct counts per key without a per-key shuffle hotspot:
    * dedup on (key, value) — the exchange hashes BOTH columns, so a
    * hot key's values spread across reducers — then count per key.
    * (A naive countDistinct shuffles the hot key to one reducer and
    * holds its whole value set in one aggregation buffer.)
    */
  def countDistinctSkewed(df: DataFrame, key: String, value: String): DataFrame =
    df.select(col(key), col(value)).distinct()
      .groupBy(col(key))
      .agg(count(lit(1)).as(s"n_distinct_$value"))

  /** Key-skew audit: every key whose row count exceeds `minSkew` ×
    * the mean key load, with the salt factor that spreads it back to
    * ~mean per reducer — the `salt` parameter [[joinSkewed]] takes.
    * Measurement and mitigation share a contract so an operator can
    * close the loop mechanically (audit → rec_salt → joinSkewed); the
    * per-key rollup is keys-sized, one partial-combining scan of the
    * fact at any size. */
  def skewAudit(fact: DataFrame, key: String, minSkew: Double = 4.0): DataFrame = {
    val perKey = fact.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
    val stats = perKey.agg(sum(col("n_rows")).as("total"),
      count(lit(1)).as("n_keys"))
    perKey.crossJoin(broadcast(stats))
      .withColumn("skew",
        col("n_rows").cast("double") / (col("total").cast("double") / col("n_keys")))
      .filter(col("skew") > minSkew)
      .select(col(key), col("n_rows"),
        round(col("n_rows").cast("double") / col("total"), 6).as("share"),
        round(col("skew"), 6).as("skew"),
        ceil(col("skew")).cast("long").as("rec_salt"))
      .orderBy(col("n_rows").desc, col(key))
  }

  /** Salted join for a hot-keyed fact side against a small-but-not-
    * broadcastable dim: the fact side gets a random-ish salt derived
    * from a unique id (any value works — it only spreads rows), the
    * dim side is replicated `salt` times, and the join key becomes
    * (key, salt) so one hot key lands on `salt` reducers.
    */
  def joinSkewed(fact: DataFrame, dim: DataFrame, key: String, salt: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt.toLong)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** The audit→mitigation loop closed MECHANICALLY: run [[skewAudit]]
    * on the fact, broadcast its (key, rec_salt) recommendations (keys-
    * sized by construction — only keys above the skew threshold), and
    * salt ONLY the flagged keys with each key's OWN recommended
    * fanout; cold keys take the plain equi-join untouched. Inner-join
    * equivalent to `fact.join(dim, key)` on any input: a uniform
    * corpus produces an empty audit and degenerates to exactly the
    * naive plan plus one keys-sized broadcast. The dim side replicates
    * per flagged key only (sum of rec_salt rows), so the hot path's
    * exchange spreads a hot key across rec_salt reducers while the
    * dim stays near its original size.
    */
  def autoJoin(fact: DataFrame, dim: DataFrame, key: String,
               minSkew: Double = 4.0): DataFrame = {
    val rec = skewAudit(fact, key, minSkew).select(col(key), col("rec_salt"))
    val tagged = fact.join(broadcast(rec), Seq(key), "left")
    val hot = tagged.filter(col("rec_salt").isNotNull)
      .withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id()), col("rec_salt")))
      .drop("rec_salt")
    val cold = tagged.filter(col("rec_salt").isNull).drop("rec_salt")
    val hotDim = dim.join(broadcast(rec), Seq(key))
      .withColumn("_salt", explode(sequence(lit(0L), col("rec_salt") - 1L)))
      .drop("rec_salt")
    hot.join(hotDim, Seq(key, "_salt")).drop("_salt")
      .unionByName(cold.join(dim, Seq(key)))
  }
}
