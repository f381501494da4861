package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-checkpoint data generator (round 14): replicate the driver's
  * sf0.1 tables ×N into a local sf1 so the 100 TB scaling claims can
  * be MEASURED once instead of argued from plan shape — the judge's
  * SCALING_MEASURED.md checkpoint. Replication preserves workload
  * character rather than just row counts:
  *
  *  - documents: replica k rewrites every word to a replica-tagged
  *    form ("fox" → "fox_r3"), EXCEPT the 20 langid marker stopwords,
  *    which stay verbatim. WITHIN a replica, natural dup groups
  *    mirror the original corpus exactly (the rewrite is a bijection
  *    applied uniformly, so two docs share a shingle/window after
  *    tagging iff they shared it before); ACROSS replicas a shingle,
  *    stride-1 window, or minhash band can collide ONLY through the
  *    two deliberate exemptions — an all-stopword shingle (the
  *    markers stay verbatim, so "of the and" is identical in every
  *    replica and can tie minhash minima, especially under single-
  *    minhash 16x1 bands) and empty/whitespace-only docs (kept as-is,
  *    exact F-way cross-replica duplicates) — while word count /
  *    stopword ratios / langid profiles are preserved. Both residues
  *    are corpus-rare (measured at sf1, factor 10: 0 all-stopword
  *    10-word windows, 0 all-stopword 5-word shingles, 0 empty docs —
  *    the exponent tables ride no residual collisions at all; a
  *    stopword-heavier corpus would see a small constant rate, not a
  *    growing one, because the residue is replica-count-independent).
  *    The round-14 form prepended ONE tag
  *    token instead — which decorrelates nothing a hash of the
  *    remaining text sees: replicas of a doc were genuine near-dups
  *    (Jaccard ≈ (n−s)/(n+s)), so at factor F every doc sat in an
  *    F-way LSH clique and pair-generating operators paid C(F,2) per
  *    doc — measured at F=100 (round 16): d21's band self-join fed
  *    ~C(100,2)×30-band rows into its distinct and one run spilled
  *    >70 GB. Real corpora grow at ~constant dup-GROUP size; the
  *    tagged rewrite models that, which is what a scaling exponent
  *    must hold fixed to mean anything.
  *  - events: ids and users shift per replica (10× users over the
  *    same one-month window — a bigger corpus over the same period),
  *    timestamps untouched so windows/watermark profiles hold.
  *  - embeddings: replica k rotates each vector by k positions —
  *    norm and coordinate distribution identical, direction new, so
  *    ANN geometry (cell balance, recall difficulty) scales honestly.
  *  - lineitem/orders: fact keys shift, dimension keys stay — join
  *    topology (dim cardinalities, fanout) preserved.
  *  - dimensions (region/nation/customer/supplier/part): copied.
  *
  * Usage: runMain graft.ScaleData <srcDir> <dstDir> [factor]
  * The dst tables are directories named `<table>.parquet` (Spark and
  * the library's loaders read either shape).
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = args.lift(2).flatMap(_.toIntOption).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.coalesce(parts).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")

    // replicas as a lit-joined sequence: one wide scan, no driver loop
    def replicas(df: DataFrame): DataFrame =
      df.crossJoin(
        spark.range(factor.toLong).select(col("id").as("rep")))

    val docs = read("documents")
    val docSpan = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    // langid marker stopwords (the TextOps.t1 lists): kept verbatim so
    // replica language/quality profiles match the original corpus
    val stop = Seq("the", "a", "of", "and", "to",
      "der", "die", "das", "und", "nicht",
      "el", "los", "las", "y", "una",
      "le", "la", "et", "les", "des")
    write(replicas(docs).select(
      (col("doc_id") + col("rep") * docSpan).as("doc_id"),
      when(col("rep") === 0L || trim(col("text")) === "", col("text"))
        .otherwise(array_join(transform(
          split(trim(col("text")), "\\s+"),
          x => when(x.isin(stop: _*), x)
            .otherwise(concat(x, lit("_r"), col("rep").cast("string")))),
          " ")).as("text"),
      col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents", 8)

    val ev = read("events")
    val evSpan = ev.agg(max(col("event_id"))).head().getLong(0) + 1L
    val userSpan = ev.agg(max(col("user_id"))).head().getLong(0) + 1L
    write(replicas(ev).select(
      (col("event_id") + col("rep") * evSpan).as("event_id"),
      col("ts"),
      (col("user_id") + col("rep") * userSpan).as("user_id"),
      col("event_type"), col("value"), col("props")),
      "events", 16)

    val emb = read("embeddings")
    val vecSpan = emb.agg(max(col("vec_id"))).head().getLong(0) + 1L
    write(replicas(emb).select(
      (col("vec_id") + col("rep") * vecSpan).as("vec_id"),
      // rotate by rep MOD dim: a factor above the embedding dimension
      // must wrap, not drive the first slice's length negative
      // (factor is an unvalidated CLI arg — r14 advisor)
      expr("concat(slice(embedding, cast(pmod(rep, size(embedding)) as int) + 1, " +
        "size(embedding) - cast(pmod(rep, size(embedding)) as int)), " +
        "slice(embedding, 1, cast(pmod(rep, size(embedding)) as int)))").as("embedding"),
      col("label")),
      "embeddings", 8)

    val li = read("lineitem")
    val loSpan = li.agg(max(col("l_orderkey"))).head().getLong(0) + 1L
    write(replicas(li).select(
      (col("l_orderkey") + col("rep") * loSpan).as("l_orderkey"),
      col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate")),
      "lineitem", 16)

    val ord = read("orders")
    val ooSpan = ord.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
    write(replicas(ord).select(
      (col("o_orderkey") + col("rep") * ooSpan).as("o_orderkey"),
      col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority")),
      "orders", 8)

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(n => write(read(n), n, 1))

    println(s"[scale] wrote ${factor}x of $src to $dst")
    spark.stop()
  }
}
