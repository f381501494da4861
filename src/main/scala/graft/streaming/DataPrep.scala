package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.functions.Portable

/** Incremental training-data curation: the batch prep pipeline (p1 —
  * exact dedup → quality filter → token accounting) re-expressed over
  * a live subscription, so a corpus keeps growing without ever
  * re-scanning what was already curated.
  *
  * The dedup is content-addressed (md5 of normalized text) and
  * bounded by the watermark: a duplicate document is dropped while a
  * redelivery/copy could still plausibly arrive, exactly like
  * `Subscriber.exactlyOnce` bounds uuid dedup. Quality features come
  * from `graft.queries.Pipeline.withQuality`, so streaming and batch
  * curation apply the SAME score. Progress is checkpointed — a
  * crashed curator resumes after its last finished micro-batch.
  */
object DataPrep {

  /** Does `dir` exist on ITS filesystem? Resolved through the Hadoop
    * FS API so durable-store paths work identically on local disk
    * (tests, local mode) and HDFS/S3 (a cluster) — a java.io.File
    * check would report a remote store absent forever and silently
    * empty the dedup history every micro-batch. */
  private[graft] def pathExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Curate a message stream (shape of `Subscriber.subscribe`, with
    * the document text as the payload) into a parquet corpus dir. */
  def curate(msgs: DataFrame, outDir: String, checkpointDir: String,
             minQuality: Double = 0.5,
             watermarkDelay: String = "10 minutes"): StreamingQuery =
    graft.queries.Pipeline.withQuality(
      msgs.select(
          col("uuid").cast("long").as("doc_id"),
          col("payload").cast("string").as("text"),
          col("ts"))
        .withColumn("h", Portable.md5bin(Portable.normText(col("text"))))
        .withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark("h"))
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"), col("h"), col("n_words"), col("quality"),
        col("text"), col("ts"))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** [[curate]] with p6's drift monitor riding the SAME ingest stream
    * under ONE checkpoint: each micro-batch writes its (source,
    * ingest_day) quality cells — mergeable (n, Σq, Σq²) sums — to
    * `cellsDir` and its curated docs to `outDir`. Ordering matters and
    * is deliberate: the monitor observes RAW ARRIVALS, before dedup
    * and before the quality filter — a degraded source typically ships
    * repetitive spam, which is exactly what content dedup collapses
    * and the filter drops, so a post-curation monitor would watch the
    * corpus its own pipeline already cleaned and see no drift. Source
    * attribution is `sourceCol` (default: the partition key, the
    * producer-set provenance field).
    *
    * Because the monitor needs pre-dedup rows and a streaming query
    * exposes only one stage to its sink, dedup here is the durable-
    * digest-store pattern ([[segmentDedupStep]]'s idiom) instead of
    * engine state: first arrival per content hash within the batch,
    * then left-anti against every digest ever seen. That makes the
    * dedup EXACT over all history (16 bytes/doc of plain parquet, vs
    * [[curate]]'s watermark-bounded engine state) at the cost of one
    * digest-store scan per micro-batch — digests only, never text.
    * All three writes are idempotent per micro-batch
    * (`<dir>/micro_batch_id=N` overwrite, the drainWithDlq pattern),
    * so a crash between them replays cleanly, and the cells dir is
    * append-only partial aggregates folded on read by [[ingestDrift]]
    * — (sources × days) rows per micro-batch, no read-modify-write. */
  def curateMonitored(msgs: DataFrame, outDir: String, cellsDir: String,
                      hStoreDir: String, checkpointDir: String,
                      minQuality: Double = 0.5,
                      sourceCol: Column = col("partition_key"),
                      evalWins: Option[DataFrame] = None): StreamingQuery =
    graft.queries.Pipeline.withQuality(
      msgs.select(
          col("uuid").cast("long").as("doc_id"),
          col("payload").cast("string").as("text"),
          sourceCol.cast("string").as("source"),
          col("ts"))
        .withColumn("h", Portable.md5bin(Portable.normText(col("text")))))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.cache()
        try {
          graft.queries.Pipeline.qualityCells(
              b.select(col("doc_id"), col("text"), col("source")))
            .write.mode("overwrite").parquet(s"$cellsDir/micro_batch_id=$batchId")
          // exclude THIS batch's own partition from the store read: on
          // crash-replay the partial write from the failed attempt is
          // already on disk, and anti-joining against it would empty
          // `fresh` — the overwrite below would then erase the batch's
          // docs and digests instead of replaying them
          val store =
            // the existence check (not just the catch) keeps Spark's
            // FileStreamSink metadata probe from logging a WARN stack
            // trace on the stream's first micro-batch. Hadoop FS, not
            // java.io.File: the store dir is HDFS/S3 on a cluster,
            // where a local-file check would report absent forever
            // and silently empty the dedup store every batch.
            if (!DataPrep.pathExists(spark, hStoreDir))
              spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
                org.apache.spark.sql.types.StructType(Seq(
                  org.apache.spark.sql.types.StructField("h",
                    org.apache.spark.sql.types.BinaryType))))
            else try {
              // resume a migration a crash interrupted BEFORE reading
              // (the marker outlives the crash; migration is
              // idempotent per partition)
              if (migrationMarker(spark, hStoreDir).exists(_._2))
                migrateLegacyHStore(spark, hStoreDir)
              val raw = spark.read.parquet(hStoreDir)
                .filter(col("micro_batch_id") =!= batchId)
              // the h column changed md5hex (StringType) -> md5bin
              // (BinaryType) in round 12: a store written by the old
              // version must be MIGRATED, not coerced — a silent
              // string-vs-binary mismatch makes the left_anti join
              // below never match and re-curates every previously-
              // seen doc (silent dedup loss). The migration rewrites
              // the legacy partitions ON DISK once (unhex, 16-byte
              // binary) so every later batch — which will mix this
              // run's binary partitions into the same read — keeps a
              // mergeable store. A store with any OTHER h type is a
              // corruption, named loudly.
              raw.schema("h").dataType match {
                case org.apache.spark.sql.types.BinaryType => raw.select(col("h"))
                case org.apache.spark.sql.types.StringType =>
                  migrateLegacyHStore(spark, hStoreDir)
                  spark.read.parquet(hStoreDir)
                    .filter(col("micro_batch_id") =!= batchId).select(col("h"))
                case other => throw new IllegalStateException(
                  s"[graft] curateMonitored digest store at $hStoreDir has h: $other; expected BINARY (md5bin) or legacy STRING (md5hex)")
              }
            } catch {
              case _: org.apache.spark.sql.AnalysisException =>
                // no store yet (first batch): an empty binary frame
                spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
                  org.apache.spark.sql.types.StructType(Seq(
                    org.apache.spark.sql.types.StructField("h",
                      org.apache.spark.sql.types.BinaryType))))
            }
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("h")).orderBy(col("ts"), col("doc_id"))
          val fresh = b
            .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
            .join(store, Seq("h"), "left_anti")
            .cache()
          try {
            val qualified = fresh.filter(col("quality") >= minQuality)
            // round 12 — the COMPLETE live curate chain under the one
            // checkpoint: when the caller supplies the frozen eval
            // window set, every quality-passing arrival is also
            // (a) routed code vs prose (t25's classifier) and
            // (b) screened span-wise against the eval set (t26's
            // detector) by the SAME routeStep the batch tables use.
            // Docs whose contamination coverage demands drop_doc never
            // reach the corpus; redact_spans survivors carry their
            // action so the downstream redaction job knows its work
            // items; output is laid out by mix bucket — the layout
            // the p5 mixture builder reads. Without evalWins the
            // write is the original quality-gated shape, unchanged.
            evalWins match {
              case Some(ev) =>
                val route = routeStep(
                  qualified.select(col("doc_id"), col("text")), ev)
                  .select(col("doc_id"), col("bucket"), col("action"))
                qualified.join(route, Seq("doc_id"))
                  .filter(col("action") =!= "drop_doc")
                  .select(col("doc_id"), col("h"), col("n_words"),
                    col("quality"), col("text"), col("ts"),
                    col("bucket"), col("action"))
                  .write.mode("overwrite").partitionBy("bucket")
                  .parquet(s"$outDir/micro_batch_id=$batchId")
              case None =>
                qualified
                  .select(col("doc_id"), col("h"), col("n_words"),
                    col("quality"), col("text"), col("ts"))
                  .write.mode("overwrite")
                  .parquet(s"$outDir/micro_batch_id=$batchId")
            }
            // the store records every digest SEEN — quality-rejected
            // docs included, so a re-upload of a rejected doc never
            // reaches the filter twice
            fresh.select(col("h"))
              .write.mode("overwrite").parquet(s"$hStoreDir/micro_batch_id=$batchId")
          } finally fresh.unpersist()
        } finally b.unpersist()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** (marker path, exists) for an in-progress legacy-store migration;
    * None when the store dir itself doesn't exist yet. */
  private def migrationMarker(spark: SparkSession,
                              hStoreDir: String): Option[(org.apache.hadoop.fs.Path, Boolean)] = {
    val root = new org.apache.hadoop.fs.Path(hStoreDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else {
      val m = new org.apache.hadoop.fs.Path(root, "_graft_hstore_migrating")
      Some((m, fs.exists(m)))
    }
  }

  /** ONE-TIME on-disk migration of a legacy (pre-round-12 md5hex)
    * digest store: every `micro_batch_id=` partition whose h column
    * is StringType is rewritten as 16-byte binary (`unhex`) in place,
    * under a marker file so a crash mid-migration resumes instead of
    * leaving a half-string half-binary store (which would fail every
    * later merged read). Idempotent per partition — already-binary
    * partitions are untouched. Cost: one read+write of the legacy
    * partitions, once per store lifetime. */
  private def migrateLegacyHStore(spark: SparkSession, hStoreDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(hStoreDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(root, "_graft_hstore_migrating")
    if (!fs.exists(marker)) fs.create(marker).close()
    fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("micro_batch_id="))
      .foreach { st =>
        val part = spark.read.parquet(st.getPath.toString)
        if (part.schema("h").dataType == org.apache.spark.sql.types.StringType) {
          val tmp = new org.apache.hadoop.fs.Path(root, s".migrating_${st.getPath.getName}")
          part.select(unhex(col("h")).as("h")).write.mode("overwrite").parquet(tmp.toString)
          fs.delete(st.getPath, true)
          if (!fs.rename(tmp, st.getPath))
            throw new IllegalStateException(
              s"[graft] digest-store migration could not rename $tmp to ${st.getPath}")
        }
      }
    fs.delete(marker, false)
    System.err.println(s"[graft] curateMonitored migrated legacy md5hex digest store at $hStoreDir to md5bin (16-byte binary)")
  }

  /** The drift table over a [[curateMonitored]] cells dir: fold the
    * per-micro-batch partial cells (associative sums) and apply p6's
    * z-test decision layer — the identical code path as the batch
    * query, so streamed ≡ batch by construction. Cells-sized work:
    * nothing here grows with the corpus. */
  def ingestDrift(spark: SparkSession, cellsDir: String): DataFrame =
    graft.queries.Pipeline.driftFromCells(
      spark.read.parquet(cellsDir)
        .groupBy(col("source"), col("ingest_day"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("s1")).as("s1"), sum(col("s2")).as("s2")))

  /** p11's media curate cascade over a LIVE subscription (round 13):
    * each micro-batch of opaque binary arrivals is routed by magic
    * bytes alone, decoded by the matching real codec, and gated by
    * the same production media-QA rules as the batch query — the
    * identical [[graft.dsl.GraftDataFrameOps.mediaCurate]] code
    * path, so streamed ≡ batch by construction. Two idempotent
    * writes per micro-batch (the drainWithDlq pattern — overwrite
    * under `micro_batch_id=N`, crash-replay safe): the per-doc
    * disposition table to `outDir`, and the mergeable per
    * (modality, disposition) count cells to `cellsDir`, folded on
    * read by [[mediaYield]]. Payload bytes stay inside the
    * micro-batch's map pass; the cells are (modalities ×
    * dispositions) rows — nothing here grows with the corpus. */
  def mediaCurateStream(msgs: DataFrame, outDir: String, cellsDir: String,
                        checkpointDir: String,
                        darkBrightness: Double = 120.0,
                        silentRms: Double = 8000.0,
                        clippedPeak: Double = 31000.0,
                        staticMotion: Double = 18.0): StreamingQuery =
    msgs.select(col("uuid").cast("long").as("doc_id"), col("payload"))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import graft.dsl._
        val disp = batch.toDF()
          .mediaCurate("doc_id", "payload", darkBrightness, silentRms,
            clippedPeak, staticMotion)
          .cache()
        try {
          disp.write.mode("overwrite").parquet(s"$outDir/micro_batch_id=$batchId")
          disp.groupBy(col("modality"), col("disposition"))
            .agg(count(lit(1)).as("n_docs"))
            .write.mode("overwrite").parquet(s"$cellsDir/micro_batch_id=$batchId")
        } finally disp.unpersist()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** The LIVE form of the p13 crawl curate cascade: each micro-batch
    * of raw `.warc.gz` members (on the TLV binary envelope — real
    * compressed bytes, no base64) runs the SAME decode
    * ([[graft.queries.Pipeline.crawlDecode]]: inflate → WARC/HTTP
    * grammar → HTML extraction), the SAME gate features
    * ([[graft.queries.Pipeline.crawlGates]]), and the SAME
    * first-catching cascade ([[graft.queries.Pipeline.crawlCascade]])
    * the batch table uses — only the duplicate test changes shape:
    * first-arrival (in-batch rank by doc id + the durable digest
    * store, curateMonitored's exact-over-all-history pattern) instead
    * of a corpus-wide min window. That is the honest streaming
    * semantics: a live ingest cannot know a "smaller" group member
    * will arrive later, so the batch table's min-id canonicalization
    * is reproduced exactly when arrivals come in id order and
    * GROUP-equivalently under any order (every gate decision
    * identical, exactly one keeper per duplicate group, same keep
    * count — spec-proved under the sharded publisher's arbitrary
    * file order).
    * Round 14: the decode now surfaces WARC-Target-URI, a published
    * per-host template inventory strips site chrome before the gates
    * (t32's kernel — mining stays a batch artifact, a micro-batch
    * sample can't see corpus-wide df shares), and the url-dedup gate
    * (d7's canonicalizer) runs ahead of the content gate with its own
    * durable digest store. Both stores record every digest SEEN
    * (gate-failed docs included: batch dedup ranks over the whole
    * corpus, so the live form must too); writes are idempotent per
    * micro-batch. Digests are 16 bytes; markup never leaves the
    * decode map pass.
    * Round 15: the cascade decontaminates — every micro-batch is
    * screened span-wise against `evalDigests`, the SAME published
    * eval-excerpt artifact the batch query derives
    * ([[graft.queries.Pipeline.crawlEvalDigests]]), through the SAME
    * detector ([[graft.queries.Pipeline.crawlContam]] — t26's
    * kernel). The stage is stateless given the frozen artifact, so
    * streamed dispositions equal batch for BOTH decontam classes
    * under any arrival order (spec-proved). */
  def crawlCurateStream(msgs: DataFrame, outDir: String, hStoreDir: String,
                        uStoreDir: String, inventory: DataFrame,
                        evalDigests: DataFrame,
                        checkpointDir: String): StreamingQuery =
    msgs.select(col("uuid").cast("long").as("doc_id"), col("payload"))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        // the template inventory is a PUBLISHED artifact (the last
        // batch mining pass), not per-micro-batch state: a micro-batch
        // sample cannot see corpus-wide df shares, the same
        // built-once/served-many shape as the ANN index
        val scored = graft.queries.Pipeline.crawlGates(
            graft.queries.Pipeline.crawlStrip(
              graft.queries.Pipeline.crawlDecode(
                batch.select(col("doc_id"), col("payload"))
                  .as[(Long, Array[Byte])]),
              inventory))
          .cache()
        try {
          // the existence check keeps Spark's FileStreamSink metadata
          // probe from logging a WARN stack trace on every stream's
          // first micro-batch (Hadoop FS — the store is HDFS/S3 on a
          // cluster); the catch stays for the exists-but-empty dir (a
          // caller that pre-created the store path), which throws at
          // schema inference instead
          def store(dir: String, keyCol: String) = {
            def empty = spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row],
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField(keyCol,
                  org.apache.spark.sql.types.BinaryType))))
            if (!DataPrep.pathExists(spark, dir)) empty
            else try spark.read.parquet(dir)
              .filter(col("micro_batch_id") =!= batchId).select(col(keyCol))
            catch {
              case _: org.apache.spark.sql.AnalysisException => empty
            }
          }
          val hW = org.apache.spark.sql.expressions.Window
            .partitionBy(col("h")).orderBy(col("doc_id"))
          val uW = org.apache.spark.sql.expressions.Window
            .partitionBy(col("uh")).orderBy(col("doc_id"))
          // dedup ranks over the DECONTAMINATED corpus, matching the
          // batch windows: a decontam-dropped doc neither counts in
          // the in-batch ranks nor lands in the digest stores, so it
          // can't claim canonical status for a group whose clean
          // re-crawl should land (every OTHER disposition's digests
          // are still recorded — batch dedup ranks over the whole
          // gate-failed corpus, so the live form must too)
          val withContam = scored
            .join(graft.queries.Pipeline.crawlContam(
              scored.select(col("doc_id"), col("text")), evalDigests),
              Seq("doc_id"), "left")
            .withColumn("dropped",
              coalesce(col("contam_action") === "drop_doc", lit(false)))
            .cache()
          try {
            val survives = when(col("dropped"), 0L).otherwise(1L)
            val cum = org.apache.spark.sql.expressions.Window
            val marked = withContam
              .withColumn("rn", sum(survives).over(
                hW.rowsBetween(cum.unboundedPreceding, cum.currentRow)))
              .withColumn("urn", sum(survives).over(
                uW.rowsBetween(cum.unboundedPreceding, cum.currentRow)))
              .join(store(hStoreDir, "h").withColumn("seen", lit(true))
                .distinct(), Seq("h"), "left")
              .join(store(uStoreDir, "uh").withColumn("useen", lit(true))
                .distinct(), Seq("uh"), "left")
            graft.queries.Pipeline.crawlCascade(marked,
                col("urn") > 1 || col("useen").isNotNull,
                col("rn") > 1 || col("seen").isNotNull)
              .write.mode("overwrite").parquet(s"$outDir/micro_batch_id=$batchId")
            withContam.filter(!col("dropped")).select(col("h")).distinct()
              .write.mode("overwrite").parquet(s"$hStoreDir/micro_batch_id=$batchId")
            withContam.filter(!col("dropped")).select(col("uh")).distinct()
              .write.mode("overwrite").parquet(s"$uStoreDir/micro_batch_id=$batchId")
          } finally withContam.unpersist()
        } finally scored.unpersist()
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** The yield table over a [[mediaCurateStream]] cells dir: fold the
    * per-micro-batch partial count cells (associative sums) into the
    * per (modality, disposition) inventory with each disposition's
    * share of its modality — the table a media-pipeline operator
    * watches ("is the static-video rate creeping?"). Cells-sized
    * work, corpus-size-independent. */
  def mediaYield(spark: SparkSession, cellsDir: String): DataFrame = {
    val cells = spark.read.parquet(cellsDir)
      .groupBy(col("modality"), col("disposition"))
      .agg(sum(col("n_docs")).as("n_docs"))
    val totals = cells.groupBy(col("modality"))
      .agg(sum(col("n_docs")).as("modality_docs"))
    cells.join(totals, Seq("modality"))
      .withColumn("share", round(col("n_docs") / col("modality_docs"), 6))
      .select(col("modality"), col("disposition"), col("n_docs"), col("share"))
  }

  /** One ingest step of segment-level dedup — t21's incremental form,
    * d13's disposition pattern at segment granularity. `store` is the
    * persistent digest table (`h`: one 16-byte digest per segment
    * ever seen); `batch` is an incoming (doc_id, text) micro-batch.
    * A segment is dup when the store already has it OR an earlier doc
    * in the SAME batch carries it (first-arrival, d13's batch
    * window). Returns the per-doc report (segments, dup segments,
    * ratio, keep) and the digests this batch adds. The store records
    * every segment SEEN — rejected docs' segments included — so a
    * re-upload of even a rejected doc flags fully next time. Only
    * digests shuffle; segment text never leaves the map side, and the
    * driver loop (foreachBatch in a stream, a scheduler in nightly
    * ingest) persists the returned delta — the store is durable
    * storage, not stream-engine state. */
  def segmentDedupStep(store: DataFrame, batch: DataFrame,
                       maxDupRatio: Double = 0.5): (DataFrame, DataFrame) = {
    val segs = graft.queries.TextOps.segmentRows(batch)
    val firstDoc = segs.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    val report = segs
      .join(store.select(col("h"), lit(true).as("in_store")), Seq("h"), "left")
      .join(firstDoc, Seq("h"))
      .withColumn("is_dup",
        coalesce(col("in_store"), lit(false)) || col("first_doc") < col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_segs"))
      .withColumn("dup_ratio",
        round(col("n_dup_segs").cast("double") / col("n_segs"), 6))
      .withColumn("keep", col("dup_ratio") <= maxDupRatio)
    val added = segs.select(col("h")).distinct()
      .join(store, Seq("h"), "left_anti")
    (report, added)
  }

  /** One live curate-chain ROUTING step (round 12 — the r10 verdict's
    * composition item): per micro-batch, each arriving doc is
    * (a) routed code vs prose by t25's classifier and (b) screened
    * span-wise against the frozen eval digest set by t26's detector,
    * yielding the disposition row the mix builder acts on:
    * `bucket` ∈ {code, prose} and `action` ∈ {drop_doc,
    * redact_spans, clean}. Both legs are the operators' own kernels
    * (TextOps.codeSignals / TextOps.contamSpans) and the step is
    * STATELESS given the static eval set, so the streamed union of
    * per-batch dispositions equals the batch t25/t26 tables exactly
    * (StreamingSpec). Scale shape: the eval set broadcasts (tiny by
    * nature); everything else is map-side per batch except the
    * per-doc span merge, partitioned by doc_id. */
  def routeStep(batch: DataFrame, evalWins: DataFrame): DataFrame = {
    val signals = graft.queries.TextOps.codeSignals(batch)
      .select(col("doc_id"), col("code_score"), col("is_code"))
    val contam = graft.queries.TextOps.contamSpans(batch, evalWins)
      .select(col("doc_id"), col("n_contam_windows"), col("contam_frac"),
        col("action"))
    signals.join(contam, Seq("doc_id"), "left")
      .withColumn("bucket", when(col("is_code"), "code").otherwise("prose"))
      .select(col("doc_id"), col("bucket"), col("code_score"),
        coalesce(col("n_contam_windows"), lit(0L)).as("n_contam_windows"),
        coalesce(col("contam_frac"), lit(0.0)).as("contam_frac"),
        coalesce(col("action"), lit("clean")).as("action"))
  }

  /** Incremental SPAN-level dedup — d20's duplicated-substring
    * detector in [[segmentDedupStep]]'s durable-digest-store shape,
    * at stride 1: each arriving doc's 10-word windows are checked
    * against every window digest ever seen (plus earlier docs of the
    * same batch), the dup windows merge into maximal word-space spans
    * (d20's interval merge), and the report carries the span coverage
    * + keep decision for every doc with at least [[Dedup.SpanW]]
    * words (shorter docs have no windows and pass untouched). Like all
    * first-arrival streams, flags are one-directional: a later copy
    * is flagged against history, history is not retro-flagged — the
    * batch d20 run is the periodic symmetric sweep. Store grows by
    * window digests only (16 bytes each), never text. Returns
    * (report, digests to add to the store). */
  def spanDedupStep(store: DataFrame, batch: DataFrame,
                    maxDupFrac: Double = 0.5): (DataFrame, DataFrame) = {
    import graft.queries.Dedup
    val wins = Dedup.spanWindows(
      batch.select(col("doc_id"), Portable.words(col("text")).as("w")))
    val firstDoc = wins.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    val marked = wins
      .join(store.select(col("h"), lit(true).as("in_store")), Seq("h"), "left")
      .join(firstDoc, Seq("h"))
      .withColumn("is_dup",
        coalesce(col("in_store"), lit(false)) || col("first_doc") < col("doc_id"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("i"))
    val spans = marked.filter(col("is_dup"))
      .withColumn("newspan",
        when(col("i") - lag(col("i"), 1).over(wOrd) > Dedup.SpanW, 1L).otherwise(0L))
      .withColumn("grp", sum(col("newspan")).over(wOrd))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("i")).as("s"), (max(col("i")) + (Dedup.SpanW - 1)).as("e"),
        count(lit(1)).as("nw"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("nw")).as("n_dup_windows"),
        sum(col("e") - col("s") + 1).as("covered_words"))
    val report = wins.groupBy(col("doc_id")).agg(max(col("n_words")).as("n_words"))
      .join(spans, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_spans", "n_dup_windows", "covered_words"))
      .withColumn("dup_frac",
        round(col("covered_words").cast("double") / col("n_words"), 6))
      .withColumn("keep", col("dup_frac") <= maxDupFrac)
    val added = wins.select(col("h")).distinct()
      .join(store, Seq("h"), "left_anti")
    (report, added)
  }
}
