package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Portable, TextHash, Vec}
import graft.operators.{AsOf, Components, Percentiles, Salted, Sketches}
import graft.queries.{AnnGeometry, Similarity}

/** The Column-API facade: the library's kernels and whole-operator
  * building blocks as fluent extension methods, so a user composes
  * them like built-in `org.apache.spark.sql.functions` instead of
  * calling the named query pack entries (which remain the oracle-
  * checked forms — every method here DELEGATES to the same code path
  * a pack query runs, it never re-implements).
  *
  * ```scala
  * import graft.dsl._
  * docs.select($"doc_id", $"text".minhashSig(), $"text".simhash16)
  * docs.nearDupPairs()                // d3's band-join candidates
  * fact.autoJoinSkewed(dim, "part_id") // q40's audit applied (Salted)
  * trades.joinAsOf(quotes, "id", "ts", Seq("price"))
  * ```
  *
  * Everything stays a lazy Catalyst plan: a facade expression inherits
  * the same codegen kernels, broadcast hints, and shuffle shapes the
  * pack queries are plan-audited for — DslSpec pins facade ≡ pack
  * output on the shared test tables.
  */
package object dsl {

  /** Scalar kernels as `Column` methods. */
  implicit class GraftColumnOps(private val c: Column) extends AnyVal {

    /** Whitespace-collapsed, trimmed, lower-cased text — the
      * normalization every dedup digest here starts from. */
    def normText: Column = Portable.normText(c)

    /** Whitespace word split ('' → empty array, never [""]). */
    def words: Column = Portable.words(c)

    /** Distinct n-word shingles of a text column. */
    def shingles(n: Int = 3): Column = TextHash.distinctShingles(c, n)

    /** Portable md5 hex digest (md5 over the value cast to binary —
      * matches the DuckDB oracle convention byte for byte). */
    def md5Hex: Column = Portable.md5hex(c)

    /** k-component KM (Kirsch-Mitzenmacher) minhash signature over
      * n-word shingles — one native map-side pass, `array<long>`. */
    def minhashSig(n: Int = 3, k: Int = 16): Column = TextHash.kmMinHash(c, n, k)

    /** 16-bit SimHash fingerprint from per-token md5 bits. */
    def simhash16: Column = TextHash.simHash16(c)

    /** Content-defined chunk digests (rolling-hash boundaries with
      * expected chunk length `div` bytes). */
    def cdcChunks(div: Int = 64): Column = TextHash.cdcChunks(c, div)

    /** Dot product of two `array<double>` vector columns (codegen'd
      * kernel — higher-order `aggregate` evaluates interpreted). */
    def dot(other: Column): Column = Vec.dot(c, other)

    /** Euclidean norm of an `array<double>` vector column. */
    def l2norm: Column = Vec.norm(c)

    /** Cosine similarity of two `array<double>` vector columns. */
    def cosine(other: Column): Column = Portable.cosineD(c, other)
  }

  /** Whole-operator building blocks as `DataFrame` methods. */
  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** d1's exact dedup: keep the min-`idCol` row per normalized-text
      * digest. Shuffles 16-byte digests only, never text. */
    def dedupExact(idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
      val keep = df
        .select(col(idCol), Portable.md5bin(Portable.normText(col(textCol))).as("_h"))
        .groupBy(col("_h")).agg(min(col(idCol)).as(idCol))
        .select(col(idCol))
      df.join(keep, Seq(idCol), "left_semi")
    }

    /** d2's per-document minhash signature table
      * (`idCol, s0..s{k-1}`) — the shared input to [[nearDupPairs]]
      * and any signature-agreement diagnostics. */
    def minhashSignatures(idCol: String = "doc_id", textCol: String = "text"): DataFrame =
      queries.Dedup.kmSignatures(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
        materialize = true)
      .withColumnRenamed("doc_id", idCol)

    /** d3's LSH candidate pairs (4 bands × 4 rows over the 16-minhash
      * signature): docs sharing any band hash, as (doc_a, doc_b) with
      * doc_a < doc_b. The O(n²) pair space never materializes. */
    def nearDupPairs(idCol: String = "doc_id", textCol: String = "text"): DataFrame =
      queries.Dedup.lshPairsFrom(
        queries.Dedup.kmSignatures(
          df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
          materialize = true))

    /** The LINEAR candidate form for connectivity consumers: per LSH
      * band bucket, star edges to the bucket's min doc — components
      * over these are provably identical to components over
      * `nearDupPairs`' cliques, at n−1 rows per bucket instead of
      * C(n,2). Use this (not nearDupPairs) to feed `dupComponents`
      * at corpus scale: a million-way boilerplate clique costs 10⁶
      * edges, not 5·10¹¹. */
    def nearDupEdges(idCol: String = "doc_id", textCol: String = "text"): DataFrame =
      queries.Dedup.lshStarEdges(
        queries.Dedup.kmSignatures(
          df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
          materialize = true))

    /** d9's fixpoint connected components over an edge list
      * (`node`, `nbr`) — O(diameter) rounds, shuffles (id,label)
      * pairs only. Adds `comp_id` (min node id of the component). */
    def dupComponents(maxIter: Int = 20): DataFrame =
      Components.connected(df, maxIter)

    /** q23's as-of join: for each left row, the latest right row at
      * or before its `ts`, matched on `key`. One user-keyed shuffle,
      * no range explosion. */
    def joinAsOf(right: DataFrame, key: String, ts: String,
                 valueCols: Seq[String]): DataFrame =
      AsOf.joinAsOf(df, right, key, ts, valueCols)

    /** q40+q31 composed (Salted.autoJoin): audit this fact's `key`
      * distribution, salt only the flagged-hot keys, leave cold keys
      * on the plain equi-join. ≡ `df.join(dim, key)` on any input. */
    def autoJoinSkewed(dim: DataFrame, key: String, minSkew: Double = 4.0): DataFrame =
      Salted.autoJoin(df, dim, key, minSkew)

    /** q21's exact two-phase grouped percentiles — never buffers a
      * group's values in one task (the built-in percentile_cont
      * does). */
    def percentilesExact(keyCol: String, valCol: String,
                         ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame =
      Percentiles.exact(df, keyCol, valCol,
        ps.map(p => (s"p${(p * 100).round}", p)))

    /** q30-style mergeable distinct counts: per-group HLL sketches
      * (store these per day/source; union for any rollup). */
    def hllSketchBy(groupCol: String, valueCol: String, lgK: Int = 12): DataFrame =
      Sketches.sketchBy(df, groupCol, valueCol, lgK)

    /** p1's shared quality features over `text`: adds n_words,
      * stop_ratio, punct_ratio, quality — the same score the batch
      * pipeline (p1/p4) and streaming DataPrep.curate filter on. */
    def withQualityScore: DataFrame = queries.Pipeline.withQuality(df)

    /** d20's duplicated-substring span dedup over this frame: per doc
      * with ≥1 cross-doc duplicated 10-word window, the maximal spans
      * (merged word ranges), coverage fraction, and the keep
      * decision. Catches a long passage copied INTO an
      * otherwise-distinct doc — invisible to whole-doc near-dup and
      * misaligned segment dedup. */
    def spanDedup(idCol: String = "doc_id", textCol: String = "text"): DataFrame =
      queries.Dedup.spanDedupOf(df.select(col(idCol).as("doc_id"),
        Portable.words(col(textCol)).as("w")))

    /** t26's span-level decontamination of this frame against an eval
      * corpus: per contaminated doc, the merged overlap spans,
      * coverage, and the drop_doc/redact_spans action. The eval side
      * is reduced to a DISTINCT 10-word-window digest set and
      * broadcast — the training-corpus side streams map-side against
      * a benchmark-sized hash set. */
    def decontamSpans(evalDocs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
      val evalWins = queries.Dedup.spanWindows(
        evalDocs.select(col(idCol).as("doc_id"),
          Portable.words(col(textCol)).as("w")))
        .select(col("h")).distinct()
      queries.TextOps.contamSpans(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")), evalWins)
    }

    /** q47's mergeable robust-outlier fences per group: 256-bin
      * histogram cells (the durable monitor store shape) read into
      * Tukey outer fences — (key, q25, q75, lo, hi). Rows outside
      * [lo, hi] are the alert candidates; q46's exact-median form is
      * the periodic audit. */
    def sketchFences(keyCol: String, valCol: String): DataFrame = {
      val ev = df.select(col(keyCol).as("event_type"),
        col(valCol).cast("double").as("x"))
      val stats = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("x")).as("vmin"),
          max(col("x")).as("vmax"))
      queries.Analytics.fencesFromCells(
          queries.Analytics.histCells(ev, stats), stats)
        .withColumnRenamed("event_type", keyCol)
    }

    /** t27's contamination provenance of this frame against an eval
      * corpus: one row per (doc, eval doc) pair sharing a 10-word
      * window — who leaked what, for remediation and eval-set
      * hygiene. Self-pairs (same id on both sides) are excluded; the
      * eval side reduces to a broadcast (eval_id, window-digest) set. */
    def contamProvenance(evalDocs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
      val w = queries.Dedup.SpanW
      val evalWins = evalDocs
        .select(col(idCol).as("eval_id"), Portable.words(col(textCol)).as("ew"))
        .filter(size(col("ew")) >= w)
        .select(col("eval_id"),
          explode(transform(sequence(lit(1), size(col("ew")) - (w - 1)),
            i => Portable.md5bin(array_join(slice(col("ew"), i, lit(w)), " ")))).as("h"))
        .distinct()
      val wins = queries.Dedup.spanWindows(
        df.select(col(idCol).as("doc_id"), Portable.words(col(textCol)).as("w")))
      wins.join(broadcast(evalWins), "h")
        .filter(col("doc_id") =!= col("eval_id"))
        .groupBy(col("doc_id"), col("eval_id"))
        .agg(count(lit(1)).as("n_shared_windows"),
          min(col("i")).as("first_i"), max(col("i")).as("last_i"))
    }

    /** p10's snapshot diff: this frame (the current release) against
      * `next` (the candidate), by id + normalized content digest —
      * added / removed / changed / unchanged counts with the
      * character-budget delta. Shuffles 16-byte digests + lengths,
      * never text. */
    def snapshotDiff(next: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
      def digests(f: DataFrame, hName: String, cName: String) =
        f.select(col(idCol).as("doc_id"),
          Portable.md5bin(Portable.normText(col(textCol))).as(hName),
          length(col(textCol)).cast("long").as(cName))
      digests(df, "h_old", "chars_old")
        .join(digests(next, "h_new", "chars_new"), Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("h_old").isNull, "added")
            .when(col("h_new").isNull, "removed")
            .when(col("h_old") === col("h_new"), "unchanged")
            .otherwise("changed"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("chars_new"), lit(0L)) -
            coalesce(col("chars_old"), lit(0L))).as("delta_chars"))
    }

    /** t25's code-vs-prose signals + verdict on every row of this
      * frame (semi/brace densities, keyword and symbol ratios, the
      * folded score, is_code) — all map-side, caller columns intact. */
    def codeSignals(idCol: String = "doc_id", textCol: String = "text"): DataFrame =
      queries.TextOps.codeSignals(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")))
        .drop("n_chars", "w")

    /** d19's bloom filter over this frame's normalized-text digests:
      * a ≤1024-row bit-position set. Filters from disjoint slices
      * union (`unionByName(...).distinct()`) into the fleet filter —
      * bitwise OR, the bounded-size alternative to a growing digest
      * store. */
    def bloomFilter(textCol: String = "text"): DataFrame =
      queries.Dedup.bloomOf(df.select(
        Portable.md5hex(Portable.normText(col(textCol))).as("h")))

    /** d19's membership probe against a [[bloomFilter]]: adds
      * `n_hits` and `predicted_dup` to EVERY row of this frame, all
      * caller columns intact (true = all k bits set — possibly a
      * false positive, NEVER a false negative). The verdict is
      * computed on the (id, digest) projection and joined back by
      * `idCol`, so the caller's text never rides the probe shuffle. */
    def bloomProbe(bloom: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
      val verdicts = queries.Dedup.bloomProbe(
        df.select(col(idCol).as("doc_id"),
          Portable.md5hex(Portable.normText(col(textCol))).as("h")),
        bloom)
        .select(col("doc_id").as(idCol), col("n_hits"), col("predicted_dup"))
      df.join(verdicts, Seq(idCol))
    }

    /** a18's offline index build over a vector frame: coarse cells +
      * PQ codes + centroids + codebook, each one corpus pass. The
      * returned [[graft.queries.Similarity.IvfPqIndex]] is the
      * versioned/published unit — serve batches or streams through it
      * with [[GraftIndexOps.serve]], absorb arrivals without
      * retraining via [[GraftIndexOps.absorb]]. */
    def ivfPqIndex(idCol: String = "vec_id", embCol: String = "embedding",
                   geo: AnnGeometry = AnnGeometry(),
                   m: Int = 8, subDim: Int = 8): Similarity.IvfPqIndex =
      Similarity.ivfPqIndexOf(normVecs(df, idCol, embCol), geo, m, subDim)

    /** a17's residual layout as a publishable index (round 18): codes
      * quantize (vector − assigned centroid) against a residual-space
      * codebook — the standard IVF-PQ layout for clustered corpora.
      * Same serve/absorb/compact surface as [[ivfPqIndex]]; the ONE
      * behavioral difference is maintenance: a rebuild re-codes the
      * retrained cells' members (see Similarity.rebuildCells). */
    def ivfPqResidualIndex(idCol: String = "vec_id", embCol: String = "embedding",
                           geo: AnnGeometry = AnnGeometry(),
                           m: Int = 8, subDim: Int = 8): Similarity.IvfPqIndex =
      Similarity.ivfPqResidualIndexOf(normVecs(df, idCol, embCol), geo, m, subDim)

    /** a30's serve-cost drift over a vector frame: per probe, the
      * scan bill against the base-only index vs the delta-grown one,
      * joined with a22's compaction policy for its routed cells — the
      * between-retrains capacity read. `isDelta` marks post-build
      * arrivals (rows where it is false trained the frozen geometry)
      * and is evaluated over the normalized `vec_id` column. */
    def serveDrift(isDelta: Column, idCol: String = "vec_id",
                   embCol: String = "embedding",
                   geo: AnnGeometry = AnnGeometry()): DataFrame =
      Similarity.serveDriftOf(normVecs(df, idCol, embCol), isDelta, geo)

    /** mm13's compressed-image decode over a binary payload column:
      * genuine PNG/JPEG members through the JDK ImageIO batch path →
      * per-image curation stats (container, pixel count, per-channel
      * means, brightness); truncated members quarantine ok=false
      * under their declared container, non-images as "unknown". */
    def imageStats(idCol: String = "doc_id",
                   payloadCol: String = "payload"): DataFrame =
      imageStatsOf(df, idCol, payloadCol)

    /** mm14's compressed-audio decode over a binary payload column:
      * genuine G.711 µ-law/a-law WAV members (fmt codes 7/6) through
      * the JDK javax.sound batch path → per-clip curation stats
      * (container, sample count, mean/RMS/peak amplitude — the
      * silence/clipping gates); truncated members quarantine
      * ok=false under their declared container, non-audio as
      * "unknown". */
    def audioStats(idCol: String = "doc_id",
                   payloadCol: String = "payload"): DataFrame =
      audioStatsOf(df, idCol, payloadCol)

    /** mm15's video decode over a binary payload column: genuine AVI
      * members (MJPEG '00dc' frames through the JDK JPEG codec, raw
      * BGR DIB '00db' frames by direct byte walk) → per-clip frame
      * stats (container, frame count, across-frame channel means —
      * solid-color/black-video gates — and peak inter-frame channel
      * change, the static-video/scene-cut gate); a tampered frame
      * count, truncated movi, or non-AVI payload quarantines
      * ok=false under its declared container / "unknown". */
    def videoStats(idCol: String = "doc_id",
                   payloadCol: String = "payload"): DataFrame =
      videoStatsOf(df, idCol, payloadCol)

    /** mm16's animated-GIF decode over a binary payload column:
      * genuine multi-frame GIF members through the JDK LZW/palette
      * codec → the same per-clip frame stats as [[videoStats]]
      * (frame count, across-frame channel means, peak inter-frame
      * channel change); truncated or corrupt members quarantine
      * ok=false under "gif", non-GIF as "unknown". */
    def gifStats(idCol: String = "doc_id",
                 payloadCol: String = "payload"): DataFrame =
      gifStatsOf(df, idCol, payloadCol)

    /** mm17's FLAC decode over a binary payload column: genuine FLAC
      * streams through the pure-JVM graft codec (all subframe types,
      * CRC-8 + CRC-16 + stream-MD5 verified) → the same per-clip
      * amplitude stats as [[audioStats]] (sample count, mean/RMS/
      * peak — the silence/clipping gates); a truncated or
      * bit-flipped member quarantines ok=false under "flac",
      * non-FLAC as "unknown". */
    def flacStats(idCol: String = "doc_id",
                  payloadCol: String = "payload"): DataFrame =
      flacStatsOf(df, idCol, payloadCol)

    /** p11's media curate cascade over a mixed-modality binary
      * column: magic-byte routing (the sniff IS the router — no
      * trusted metadata), real-codec decode (PNG/JPEG images,
      * G.711/PCM WAV audio, MJPEG/raw-DIB AVI video, BMP), then the
      * QA gates a production media pipeline runs. disposition =
      * decode_fail | dark | silent | clipped | static | keep — the
      * FIRST catching gate, p7's cascade rule. */
    def mediaCurate(idCol: String = "doc_id",
                    payloadCol: String = "payload",
                    darkBrightness: Double = 120.0,
                    silentRms: Double = 8000.0,
                    clippedPeak: Double = 31000.0,
                    staticMotion: Double = 18.0): DataFrame =
      mediaCurateOf(df, idCol, payloadCol, darkBrightness, silentRms,
        clippedPeak, staticMotion)

    /** t29's per-source boilerplate template mining over (id, text,
      * source): segments hash map-side on t21's shared window
      * grammar, a segment is a template in its source when its
      * document-frequency share clears `minShare` — the inventory a
      * template-removal pass consumes (rights banners, cookie
      * notices, nav chrome). Returns (source, seg_hash, df,
      * n_src_docs, share). */
    def boilerplateTemplates(minShare: Double = 0.3,
                             idCol: String = "doc_id",
                             textCol: String = "text",
                             sourceCol: String = "source"): DataFrame = {
      val base = df.select(col(idCol).as("doc_id"),
        col(textCol).as("text"), col(sourceCol).as("source"))
      graft.queries.TextOps.templateInventory(base, minShare)
        .withColumn("share",
          round(col("df").cast("double") / col("n_src_docs"), 6))
        .select(col("source"), lower(hex(col("h"))).as("seg_hash"),
          col("df"), col("n_src_docs"), col("share"))
    }

    /** Template REMOVAL over this corpus frame (t32's kernel): mine
      * the [[boilerplateTemplates]] inventory at `minShare`, broadcast
      * it as one hash array per source, and strip each doc's template
      * segments in a single map-side pass. Returns the input plus
      * kept_text / n_segs / n_tpl_segs / n_words / n_words_kept —
      * feed kept_text to the quality and language gates template
      * chrome would otherwise distort. */
    def stripTemplates(minShare: Double = 0.3,
                       idCol: String = "doc_id",
                       textCol: String = "text",
                       sourceCol: String = "source"): DataFrame =
      graft.queries.TextOps.stripTemplates(
        df.select(col(idCol).as("doc_id"),
          col(textCol).as("text"), col(sourceCol).as("source")), minShare)

    /** p12's re-index work order over this frame's (id, embedding)
      * vectors: `reEmbedded` carries the changed ids' NEW embeddings
      * (same column names), `isBase` — a predicate over the
      * normalized `vec_id` column — names the vectors the served
      * centroids were trained on. Both old and new vectors route
      * through the same centroid derivation and assignment kernel
      * the served index uses; returns the per-cell
      * (n_stay, n_out, n_in, net_moved, touched) maintenance bill —
      * a cell move is a tombstone plus an insert. */
    def reindexMoves(reEmbedded: DataFrame, isBase: Column,
                     nCentroids: Int = 10, idCol: String = "vec_id",
                     embCol: String = "embedding"): DataFrame = {
      val v = normVecs(df, idCol, embCol)
      val cents = graft.queries.Similarity
        .hashTopK(v.filter(isBase), "cent", nCentroids)
        .select(col("vec_id").as("cell"), col("emb").as("c_emb"),
          col("nrm").as("c_nrm"))
      val newV = normVecs(reEmbedded, idCol, embCol)
      val changedOld = v.join(newV.select(col("vec_id")), Seq("vec_id"), "left_semi")
      val moves = graft.queries.Similarity.assignCells(changedOld, cents)
        .select(col("vec_id"), col("cell").as("old_cell"))
        .join(graft.queries.Similarity.assignCells(newV, cents)
          .select(col("vec_id"), col("cell").as("new_cell")), "vec_id")
      val outFlow = moves.filter(col("old_cell") =!= col("new_cell"))
        .groupBy(col("old_cell").as("cell")).agg(count(lit(1)).as("n_out"))
      val inFlow = moves.filter(col("old_cell") =!= col("new_cell"))
        .groupBy(col("new_cell").as("cell")).agg(count(lit(1)).as("n_in"))
      val stay = moves.filter(col("old_cell") === col("new_cell"))
        .groupBy(col("old_cell").as("cell")).agg(count(lit(1)).as("n_stay"))
      cents.select(col("cell"))
        .join(outFlow, Seq("cell"), "left")
        .join(inFlow, Seq("cell"), "left")
        .join(stay, Seq("cell"), "left")
        .na.fill(0L, Seq("n_out", "n_in", "n_stay"))
        .withColumn("net_moved", col("n_in") - col("n_out"))
        .withColumn("touched",
          (col("n_out") + col("n_in") + col("n_stay")) > 0L)
        .select(col("cell"), col("n_stay"), col("n_out"), col("n_in"),
          col("net_moved"), col("touched"))
    }

    /** q43's gaps-and-islands sessionization: events more than
      * `gapUs` apart (per `keyCol`, ordered by `tsCol`, ties broken
      * by `tieCol`) start a new session. Adds `session_idx`
      * (1-based per key). One key-partitioned window, no self-join. */
    def sessionize(keyCol: String, tsCol: String, tieCol: String,
                   gapUs: Long = 30L * 60L * 1000000L): DataFrame = {
      val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
      df.withColumn("_prev_ts", lag(col(tsCol), 1).over(w))
        .withColumn("_new_sess",
          when(col("_prev_ts").isNull ||
            (expr(s"unix_micros($tsCol)") - expr("unix_micros(_prev_ts)")) > gapUs, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum(col("_new_sess")).over(w))
        .drop("_prev_ts", "_new_sess")
    }
  }

  /** Serve/maintain a published [[Similarity.IvfPqIndex]]. */
  implicit class GraftIndexOps(private val ix: Similarity.IvfPqIndex) extends AnyVal {

    /** Serve a probe batch (or one micro-batch of a live stream)
      * through the frozen index — route to nProbe cells, rank
      * routed candidates by the asymmetric ADC distance. */
    def serve(probes: DataFrame, idCol: String = "vec_id",
              embCol: String = "embedding", geo: AnnGeometry = AnnGeometry(),
              m: Int = 8, subDim: Int = 8, k: Int = 3): DataFrame =
      Similarity.ivfPqServeProbes(ix,
        normVecs(probes, idCol, embCol)
          .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"),
            col("nrm").as("p_nrm")),
        geo, m, subDim, k)

    /** Absorb new vectors into the frozen index WITHOUT retraining —
      * nearest existing cell, nearest existing code words (the
      * between-retrains insert path; a22's policy says when the
      * accumulated delta forces a real rebuild). Each absorb stacks a
      * NEW delta generation by default (`Similarity.AutoSeg` = max
      * existing segment + 1), so repeated absorbs between retrains
      * stay individually countable; pass `seg` to pin one. */
    def absorb(newVecs: DataFrame, idCol: String = "vec_id",
               embCol: String = "embedding",
               m: Int = 8, subDim: Int = 8,
               seg: Int = Similarity.AutoSeg): Similarity.IvfPqIndex =
      Similarity.ivfPqIndexDelta(ix, normVecs(newVecs, idCol, embCol),
        m, subDim, seg)

    /** Execute a compaction policy (a22's `(cell, action)` table) on
      * the index: `compact` cells' delta segments fold into base,
      * everything else passes through — geometry untouched, so
      * serving is unchanged row-for-row. Republish with
      * `saveIvfPqIndex(..., ivfPqIndexVersion(srcDir) + 1)`. */
    def compact(policy: DataFrame): Similarity.IvfPqIndex =
      Similarity.compactIndex(ix, policy)

    /** Execute a policy's `rebuild` arm: a15's Lloyd retrain scoped
      * to the flagged cells' members — new centroids for those cells
      * only, members re-dispatched among them, their posting lists
      * folded to a fresh base segment. `vectors` is the raw corpus
      * relation (codes are lossy; a retrain reads the base store).
      * Codes/codebook are unchanged — a property of the raw-vector
      * PQ layout this artifact stores (a residual layout would
      * re-code the retrained cells). Republish with
      * `saveIvfPqIndex(..., ivfPqIndexVersion(srcDir) + 1)`. */
    def rebuild(policy: DataFrame, vectors: DataFrame,
                idCol: String = "vec_id", embCol: String = "embedding",
                iters: Int = 1): Similarity.IvfPqIndex =
      Similarity.rebuildCells(ix, policy, normVecs(vectors, idCol, embCol), iters)
  }

  /** [[GraftDataFrameOps.imageStats]]'s body — lives OUTSIDE the
    * AnyVal wrapper because Encoder derivation synthesizes a nested
    * class, which value classes disallow. */
  private def imageStatsOf(df: DataFrame, idCol: String,
                           payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    graft.operators.MediaDecode.parseImageBatch(
        df.select(col(idCol).cast("long").as("docId"),
          col(payloadCol).as("payload"))
          .as[graft.operators.MediaDecode.Media])
      .toDF()
      .select(col("docId").as(idCol), col("container"),
        col("nUnits").as("n_units"), col("meanSignal").as("mean_signal"),
        col("meanR").as("mean_r"), col("meanG").as("mean_g"),
        col("meanB").as("mean_b"), col("ok"))
  }

  /** [[GraftDataFrameOps.audioStats]]'s body — outside the AnyVal
    * wrapper for the same Encoder-derivation reason as
    * [[imageStatsOf]]. */
  private def audioStatsOf(df: DataFrame, idCol: String,
                           payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    graft.operators.MediaDecode.parseAudioBatch(
        df.select(col(idCol).cast("long").as("docId"),
          col(payloadCol).as("payload"))
          .as[graft.operators.MediaDecode.Media])
      .toDF()
      .select(col("docId").as(idCol), col("container"),
        col("nUnits").as("n_units"), col("meanSignal").as("mean_signal"),
        col("rms"), col("peak"), col("ok"))
  }

  /** [[GraftDataFrameOps.flacStats]]'s body — outside the AnyVal
    * wrapper for the same Encoder-derivation reason as
    * [[imageStatsOf]]. */
  private def flacStatsOf(df: DataFrame, idCol: String,
                          payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    graft.operators.MediaDecode.parseFlacBatch(
        df.select(col(idCol).cast("long").as("docId"),
          col(payloadCol).as("payload"))
          .as[graft.operators.MediaDecode.Media])
      .toDF()
      .select(col("docId").as(idCol), col("container"),
        col("nUnits").as("n_units"), col("meanSignal").as("mean_signal"),
        col("rms"), col("peak"), col("ok"))
  }

  /** [[GraftDataFrameOps.videoStats]]'s body — outside the AnyVal
    * wrapper for the same Encoder-derivation reason as
    * [[imageStatsOf]]. */
  private def videoStatsOf(df: DataFrame, idCol: String,
                           payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    graft.operators.MediaDecode.parseVideoBatch(
        df.select(col(idCol).cast("long").as("docId"),
          col(payloadCol).as("payload"))
          .as[graft.operators.MediaDecode.Media])
      .toDF()
      .select(col("docId").as(idCol), col("container"),
        col("nUnits").as("n_frames"), col("meanR").as("mean_r"),
        col("meanG").as("mean_g"), col("meanB").as("mean_b"),
        col("peak").as("peak_motion"), col("ok"))
  }

  /** [[GraftDataFrameOps.gifStats]]'s body — outside the AnyVal
    * wrapper for the same Encoder-derivation reason as
    * [[imageStatsOf]]. */
  private def gifStatsOf(df: DataFrame, idCol: String,
                         payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    graft.operators.MediaDecode.parseGifBatch(
        df.select(col(idCol).cast("long").as("docId"),
          col(payloadCol).as("payload"))
          .as[graft.operators.MediaDecode.Media])
      .toDF()
      .select(col("docId").as(idCol), col("container"),
        col("nUnits").as("n_frames"), col("meanR").as("mean_r"),
        col("meanG").as("mean_g"), col("meanB").as("mean_b"),
        col("peak").as("peak_motion"), col("ok"))
  }

  /** [[GraftDataFrameOps.mediaCurate]]'s body — outside the AnyVal
    * wrapper for the same Encoder-derivation reason as
    * [[imageStatsOf]]. Mirrors the p11 pack query with the gate
    * thresholds parameterized. */
  private def mediaCurateOf(df: DataFrame, idCol: String, payloadCol: String,
                            darkBrightness: Double, silentRms: Double,
                            clippedPeak: Double, staticMotion: Double): DataFrame = {
    import df.sparkSession.implicits._
    graft.operators.MediaDecode.parseAnyBatch(
        df.select(col(idCol).cast("long").as("docId"),
          col(payloadCol).as("payload"))
          .as[graft.operators.MediaDecode.Media])
      .toDF()
      .select(col("docId").as(idCol), col("container"), col("ok"),
        col("meanR"), col("meanG"), col("meanB"), col("rms"), col("peak"))
      .withColumn("modality",
        when(col("container").isin("png", "jpeg", "bmp"), "image")
          .when(col("container").isin("ulaw", "alaw", "wav", "flac",
            "adpcm"), "audio")
          .when(col("container").isin("mjpeg", "rawvideo", "avi", "gif",
            "msrle"), "video")
          .otherwise("unknown"))
      .withColumn("disposition",
        when(!col("ok"), "decode_fail")
          .when(col("modality") === "image" &&
            (col("meanR") + col("meanG") + col("meanB")) / 3.0 < darkBrightness, "dark")
          .when(col("modality") === "audio" && col("rms") < silentRms, "silent")
          .when(col("modality") === "audio" && col("peak") >= clippedPeak, "clipped")
          .when(col("modality") === "video" && col("peak") < staticMotion, "static")
          .otherwise("keep"))
      .select(col(idCol), col("modality"), col("container"), col("disposition"))
  }

  /** (id, embedding) in any numeric array type → the (vec_id, emb,
    * nrm) frame every similarity kernel reads: one map-side cast +
    * norm, the float→double widening a native array cast. */
  private def normVecs(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).as("vec_id"),
        col(embCol).cast("array<double>").as("emb"))
      .withColumn("nrm", Vec.norm(col("emb")))
}
