package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The lshStarEdges hub A/B on a PLANTED mega-bucket (r17 verdict #3).
  *
  * Round 16 shipped the groupBy-min hub form on an argument — a window
  * min routes a mega-bucket's every row through one task — but the
  * honest scale generator produces no mega buckets (its replica
  * cliques are ≤100-way), so the sf10 A/B read parity (0.82 vs 0.83 s)
  * and the divergence the form was shipped for was never measured.
  * This harness plants the bucket the generator cannot exhibit — a
  * boilerplate class of N docs sharing ALL 16 signature slots, so all
  * 4 bands collide into one (band, hash) bucket of N rows each — on
  * top of the honest corpus signatures, and times the two hub forms
  * on identical input:
  *
  *   - groupBy-min (shipped): partial min combines map-side; the
  *     rejoin PROBES the mega-bucket's rows against a one-row-per-
  *     bucket build side — no task ever buffers the bucket.
  *   - window min (r16 form): partitionBy(band_id, band_hash) sorts
  *     and buffers each bucket in ONE task — the straggler class.
  *
  * Both forms must emit the same edge set (asserted); the measurement
  * is wall time at growing N. Run from sbt:
  *   Test/runMain graft.HubAb /root/testdata/sf0.1 100000 1000000
  */
object HubAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ns = args.drop(1).map(_.toLong).toSeq match {
      case Seq() => Seq(100000L, 1000000L)
      case s => s
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // honest background: the d-family's real corpus signatures
    val honest = graft.queries.Dedup.kmSignatures(
      graft.queries.Dedup.withNearDupes(spark, sfDir), materialize = true)
    val sigCols = (0 until 16).map(i => s"s$i")

    def plantedSigs(n: Long): DataFrame = {
      // one boilerplate class: every member shares all 16 slots, so
      // every band hashes identically — ONE bucket of n rows per band
      val planted = spark.range(n)
        .select((col("id") + 10000000L).as("doc_id") +:
          sigCols.map(c => lit(12345L).as(c)): _*)
      honest.select((col("doc_id") +: sigCols.map(col)): _*)
        .unionByName(planted)
        .localCheckpoint() // both forms read the same materialized rows
    }

    // the two hub forms over the shared band explode
    def bandsOf(sigs: DataFrame): DataFrame =
      sigs.select(col("doc_id"),
        posexplode(array((0 until 4).map { b =>
          md5(concat_ws("|", (0 until 4).map(r => col(s"s${b * 4 + r}")): _*).cast("binary"))
        }: _*)).as(Seq("band_id", "band_hash")))

    def starGroupBy(sigs: DataFrame): DataFrame = {
      val bands = bandsOf(sigs)
      val hubs = bands.groupBy(col("band_id"), col("band_hash"))
        .agg(min(col("doc_id")).as("hub"))
      bands.join(hubs, Seq("band_id", "band_hash"))
        .filter(col("doc_id") =!= col("hub"))
        .select(col("hub").as("doc_a"), col("doc_id").as("doc_b"))
        .distinct()
    }

    def starWindow(sigs: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("band_id"), col("band_hash"))
      bandsOf(sigs)
        .withColumn("hub", min(col("doc_id")).over(w))
        .filter(col("doc_id") =!= col("hub"))
        .select(col("hub").as("doc_a"), col("doc_id").as("doc_b"))
        .distinct()
    }

    def time(label: String)(df: => DataFrame): Double = {
      df.queryExecution.toRdd.count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[hub-ab] $label%-28s med ${ts(1)}%.2f s (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
      ts(1)
    }

    ns.foreach { n =>
      println(s"[hub-ab] planted mega-bucket N=$n on ${sfDir}")
      val sigs = plantedSigs(n)
      // same candidate set (the correctness precondition of the A/B)
      val g = starGroupBy(sigs); val w = starWindow(sigs)
      val diff = g.exceptAll(w).count() + w.exceptAll(g).count()
      require(diff == 0L, s"hub forms disagree on $diff edges")
      val tg = time(s"groupBy-min hub N=$n")(starGroupBy(sigs))
      val tw = time(s"window-min hub  N=$n")(starWindow(sigs))
      println(f"[hub-ab] N=$n divergence: window/groupBy = ${tw / tg}%.2fx")
    }
    spark.stop()
  }
}
