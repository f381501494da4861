package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Portable

/** Deduplication family (SURVEY.md §2.C) — the training-data-pipeline
  * operators over the documents table.
  *
  * The driver corpus has no natural duplicates (500 docs → 500
  * distinct normalized hashes), so each operator unions in
  * deterministic synthetic dupes (exact copies / perturbed copies)
  * and must find exactly those — an observable, oracle-checkable
  * contract instead of a vacuous 0-row result.
  *
  * Scale posture: everything shuffles digests or 16-component
  * signatures, never full documents; candidate generation is
  * LSH-bucketed (band join) so the pair space stays linear-ish in
  * corpus size rather than O(n²).
  */
object Dedup extends QueryPack {

  private val K = 16         // minhash signature components
  private val Bands = 4      // LSH bands (4 rows each)
  private val ShingleN = 3   // word shingle width

  /** d19: bloom size in bits (deliberately small — the audit needs
    * observable false positives at test SF) and hash count. */
  private[graft] val BloomBits = 1024L
  private[graft] val BloomK = 4

  /** d7's URL canonicalizer: lowercase, strip scheme + www, drop
    * query/fragment, drop the trailing slash. The one kernel every
    * url-dedup consumer shares (d7's audit, p13's crawl url gate) so
    * the definition of "same page" can never fork. Map-side regex
    * work. What shuffles is the CONSUMER's choice: p13 hashes the
    * canonical key to a 16-byte digest (`uh`) before its dedup
    * window, so crawl-scale URL sets exchange digests only; d7's
    * contract OUTPUT is the canonical url string itself (group key +
    * reported column), so its exchange carries url_norm — bounded by
    * map-side partial aggregation to one row per distinct url per
    * partition, and declared by name in tools/plan_discipline.py. */
  private[graft] def urlNorm(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(lower(url), "^https?://(www\\.)?", ""),
        "[?#].*$", ""),
      "/$", "")

  /** d19: the k seeded bit positions of a content digest `h`. */
  private[graft] def bloomPositions(h: Column): Column =
    array((0 until BloomK).map(i =>
      pmod(Portable.hash60(concat(lit(s"bloom$i|"), h)), lit(BloomBits))): _*)

  /** d19: a corpus slice's bloom filter as a distinct bit-position
    * set (the relational bitset — ≤ BloomBits rows). Slices union by
    * plain `unionByName(...).distinct()`: bitwise OR. */
  private[graft] def bloomOf(docs: DataFrame): DataFrame =
    docs.select(explode(bloomPositions(col("h"))).as("bit")).distinct()

  /** d19: probe `(doc_id, h)` rows against a bloom bit set —
    * predicted_dup when all k positions are present. */
  private[graft] def bloomProbe(probes: DataFrame, bloom: DataFrame): DataFrame =
    probes
      .select(col("doc_id"), col("h"), explode(bloomPositions(col("h"))).as("bit"))
      .join(broadcast(bloom.withColumn("set", lit(true))), Seq("bit"), "left")
      .groupBy(col("doc_id"), col("h"))
      .agg(sum(when(col("set"), 1).otherwise(0)).as("n_hits"))
      .withColumn("predicted_dup", col("n_hits") === BloomK)

  /** d16's per-source exact-dup yield kernel over any (source, text)
    * slice — shared by the d16 query (over its planted corpus) and
    * p8's corpus card (over the raw corpus), so the card's source
    * rows are definitionally the operator's (spec-pinned in
    * PipelineSpec). */
  private[graft] def sourceDupStats(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        Portable.md5bin(Portable.normText(col("text"))).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct"))
      .select(col("source"), col("n_docs"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"), 6)
          .as("dup_rate"))

  /** documents ∪ exact copies of every 10th doc (new ids ≥ 100000). */
  private def withExactDupes(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.unionAll(
      docs.filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L))
  }

  /** documents ∪ lightly-perturbed copies of every 20th doc — near
    * dupes with high (but not 1.0) shingle overlap. */
  private[graft] def withNearDupes(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    docs.unionAll(
      docs.filter(col("doc_id") % 20 === 0)
        .withColumn("doc_id", col("doc_id") + 100000L)
        .withColumn("text", concat(col("text"), lit(" extra tail words"))))
  }
  private val NearDupesSql =
    """SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text || ' extra tail words' AS text
      |  FROM documents WHERE doc_id % 20 = 0""".stripMargin

  /** Minhash signatures via the one-pass native kernel
    * (graft.functions.TextHash.kmMinHash): the whole KM signature is
    * computed map-side per document — no explode, no window, no
    * shuffle (the previous explode+groupBy pipeline shuffled
    * ~n_tokens rows per doc twice and dominated the dedup bench).
    * Docs with fewer than n words have no shingles and drop out,
    * exactly as the groupBy form dropped them.
    */
  /** When the signatures feed a self-join (d3/d4), pass
    * materialize=true: the repartition on doc_id materializes the
    * tiny (doc_id, 16 longs) relation ONCE behind an exchange that
    * both join sides reuse. Without it, projection collapse inlines
    * the kernel into every consumer and each self-join side
    * re-hashes the full corpus (measured 7× slower at sf0.1). */
  private[graft] def kmSignatures(docs: DataFrame, materialize: Boolean = false): DataFrame = {
    val sigs = docs
      .select(col("doc_id"),
        graft.functions.TextHash.kmMinHash(col("text"), ShingleN, K).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id") +: (0 until K).map(i => col("sig").getItem(i).as(s"s$i")): _*)
    if (materialize) sigs.repartition(col("doc_id")) else sigs
  }

  /** DuckDB mirror of one KM minhash component (table `hashed` with
    * h1/h2 in scope). */
  private def sigSql(i: Int) =
    s"min((h1 + $i * h2) % 4294967296)"

  /** DuckDB mirror of Portable.shingles (words CTE `w` in scope). */
  private val ShinglesSql =
    s"""list_transform(
       |  generate_series(1, greatest(len(w) - $ShingleN + 1, 0)),
       |  i -> array_to_string(w[i:i+${ShingleN - 1}], ' '))""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: group by md5 of normalized text; shuffle 16-byte
    // digests only. Survivor = min doc_id per group.
    "d1_exact_dedup" -> { (s, d) =>
      withExactDupes(s, d)
        .select(col("doc_id"), Portable.md5bin(Portable.normText(col("text"))).as("h"))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))
    },

    // MinHash signatures: k=16 KM minima over word shingles — one
    // native map-side pass per document, zero shuffles.
    "d2_minhash_sig" -> { (s, d) =>
      kmSignatures(Tables.documents(s, d))
        .select(col("doc_id"), concat_ws("|", (0 until K).map(i => col(s"s$i")): _*).as("signature"))
        .orderBy(col("doc_id"))
    },

    // LSH candidate pairs: 4 bands × 4 rows; docs sharing any band
    // hash become candidates. Join key is (band, 32-hex band hash) —
    // the O(n²) pair space never materializes.
    "d3_lsh_pairs" -> ((s, d) =>
      lshPairs(s, d).orderBy(col("doc_a"), col("doc_b"))),

    // Near-dup components to a FIXPOINT (operators.Components) with
    // the keeper semantics a dedup pipeline executes: comp_id IS the
    // canonical (min-id) keeper, n_members/max_doc the keep/drop
    // audit, members the full roster written next to the kept corpus.
    // Round 16 folded the former d8_dup_clusters registry entry in
    // here: d8's two-round min-label propagation was exact only for
    // diameter ≤ 2 graphs and its (keep_id, n_members, max_doc)
    // output is this query's columns — the bounded form survives as
    // [[dupClustersTwoRound]], spec-proved ≡ the fixpoint on the LSH
    // graph. The oracle is a recursive min-label reachability CTE —
    // an independent formulation that agrees only if the propagation
    // loop truly converged.
    "d9_dup_components" -> { (s, d) =>
      // STAR edges, not the d3 clique join: components only need
      // connectivity, and the star form is linear per band bucket
      // where the clique form is quadratic (see lshStarEdges — the
      // output components are provably identical, so the oracle and
      // this query's result are byte-for-byte what the clique form
      // produced)
      val pairs = lshStarEdges(kmSignatures(withNearDupes(s, d),
          materialize = true))
        .select(col("doc_a").as("node"), col("doc_b").as("nbr"))
      graft.operators.Components.connected(pairs)
        .groupBy(col("comp_id"))
        .agg(count(lit(1)).as("n_members"), max(col("node")).as("max_doc"),
          array_join(transform(array_sort(collect_list(col("node"))),
            _.cast("string")), ",").as("members"))
        .orderBy(col("comp_id"))
    },

    // Verify stage: exact n-gram Jaccard on the LSH candidates only.
    "d4_ngram_jaccard" -> { (s, d) =>
      // Candidates come from the (materialized, signature-only) band
      // join; the full shingle SETS are then computed map-side ONLY
      // for candidate doc_ids (broadcast semi-filter) — the corpus's
      // shingle arrays are never shuffled, only 16-long signatures
      // and the candidates' sets.
      val sigs = kmSignatures(withNearDupes(s, d), materialize = true)
      val bands = sigs.select(col("doc_id"),
        posexplode(array((0 until Bands).map { b =>
          md5(concat_ws("|", (0 until 4).map(r => col(s"s${b * 4 + r}")): _*).cast("binary"))
        }: _*)).as(Seq("band_id", "band_hash")))
      val l = bands.as("l"); val r = bands.as("r")
      val cand = l.join(r, col("l.band_id") === col("r.band_id") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .distinct()
      val candIds = cand.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val docsSh = withNearDupes(s, d)
        .join(broadcast(candIds), Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          graft.functions.TextHash.distinctShingles(col("text"), ShingleN).as("sh"))
      cand
        .join(broadcast(docsSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))), Seq("doc_a"))
        .join(broadcast(docsSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // SimHash: 16-bit fingerprint from per-token md5 bits — one
    // native map-side pass per document (the explode+groupBy form
    // shuffled every token row).
    "d5_simhash" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TextHash.simHash16(col("text")).as("fingerprint"))
        .filter(col("fingerprint").isNotNull)
        .orderBy(col("doc_id"))
    },

    // URL dedup: canonicalize document source URLs (scheme, case,
    // www, query/fragment, trailing slash) and keep the first doc per
    // canonical URL. The corpus's `source` is a bare token, so four
    // deterministic URL spellings are synthesized per doc — the
    // normalizer must collapse exactly those. Shuffles only the
    // normalized-url key, map-side regex work otherwise.
    "d7_url_dedup" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val urled = docs.withColumn("url",
        when(col("doc_id") % 4 === 0,
          concat(lit("https://www."), col("source"), lit(".example.com/docs/"), pmod(col("doc_id"), lit(50L))))
        .when(col("doc_id") % 4 === 1,
          concat(lit("http://"), col("source"), lit(".example.com/docs/"), pmod(col("doc_id"), lit(50L)), lit("/")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("HTTPS://"), upper(col("source")), lit(".EXAMPLE.COM/docs/"), pmod(col("doc_id"), lit(50L)), lit("?utm_source=feed")))
        .otherwise(
          concat(lit("https://"), col("source"), lit(".example.com/docs/"), pmod(col("doc_id"), lit(50L)), lit("#frag"))))
      urled
        .withColumn("url_norm", Dedup.urlNorm(col("url")))
        .groupBy(col("url_norm"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .orderBy(col("url_norm"))
    },

    // Embedding near-dup (see embeddingDup — signBits is a library
    // parameter; defs binds the test default of 4 bits / 16 buckets).
    "d6_embedding_dup" -> ((s, d) => embeddingDup(s, d)),

    // Hamming-range near-dup pairs over simhash fingerprints via
    // multi-index pigeonhole blocking (Norouzi et al., "Fast Search
    // in Hamming Space with Multi-Index Hashing", CVPR 2012): the
    // 32-bit fingerprint splits into 4 disjoint 8-bit blocks; any
    // pair within Hamming distance ≤ 3 agrees EXACTLY on ≥ 1 block
    // (3 flipped bits touch at most 3 blocks), so a per-block
    // equi-join generates a complete candidate set — the result is
    // EXACT, never all-pairs. Shuffle rows are (block, 8-bit key,
    // id, sig) — 4 tiny rows per doc; the O(n²) work the oracle does
    // never happens here. 32 bits, not d5's 16: at 5k docs the
    // 16-bit space is saturated (12% of ALL pairs within distance 3
    // — measured 1.7M pairs at sf0.1 vs 90k at 32 bits), and block
    // width sets bucket occupancy (256 buckets/index vs 16).
    "d10_hamming_pairs" -> ((s, d) => hammingPairs(s, d)),

    // Sub-document dedup via content-defined chunking (the rsync/
    // LBFS rolling-boundary trick, word-granular): chunk boundaries
    // follow the CONTENT (md5(word) ≡ 0 mod 8), so shared passages
    // chunk identically no matter where they sit in a document —
    // fixed-offset chunking would misalign after one inserted word.
    // A boilerplate paragraph is prepended to every 5th doc; its
    // chunks must surface as cross-document repeats. The kernel
    // emits ~8-word chunk fingerprints map-side in one pass; the
    // explode ships (doc_id, 8-byte fp) pairs — never chunk text —
    // and the groupBy partial-aggregates, so the shuffle is
    // fingerprint-sized at any corpus size.
    "d11_cdc_chunks" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val corpus = docs.unionAll(
        docs.filter(col("doc_id") % 5 === 0)
          .withColumn("doc_id", col("doc_id") + 100000L)
          .withColumn("text", concat(lit(Boilerplate), lit(" "), col("text"))))
      corpus.select(col("doc_id"),
          explode(graft.functions.TextHash.cdcChunks(col("text"), 8)).as("fp"))
        .groupBy(col("fp"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_docs") > 1)
        .orderBy(col("fp"))
    },

    // Semantic dedup (the SemDeDup recipe): cluster the corpus into
    // IVF cells via broadcast centroids, then look for near-dup pairs
    // ONLY within a cell — the cell structure bounds the pair space
    // the way d6's sign buckets do, but follows the data's own
    // density instead of fixed hyperplanes. Planted perturbed copies
    // (dim-0 nudged by +0.05, cosine ≈ 0.9999) land in their
    // original's cell and must surface; the all-pairs scan never
    // materializes (per-cell self-join, cells ≈ corpus/centroids).
    "d12_semantic_dedup" -> { (s, d) =>
      val base = graft.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val pert = base.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 200000L).as("vec_id"),
          concat(array(element_at(col("emb"), 1) + lit(0.05)),
            slice(col("emb"), 2, 63)).as("emb"))
      val corpus = base.unionAll(pert)
        .withColumn("nrm", graft.functions.Vec.norm(col("emb")))
      val cents = base.filter(col("vec_id") % SemCentStride === 0)
        .select(col("vec_id").as("cent_id"), col("emb").as("c_emb"))
        .withColumn("c_nrm", graft.functions.Vec.norm(col("c_emb")))
      semanticDedupPairs(corpus, cents, SemDupCos, SemMaxCell)
        .orderBy(col("keep_id"), col("dup_id"))
    },

    // Incremental ingest dedup — the daily-batch shape: a new delivery
    // is checked against the EXISTING corpus (broadcast digest
    // anti-semantics via left join) and against ITSELF (first arrival
    // wins inside the batch), and every new doc gets an auditable
    // disposition: ingested / dup_of_corpus / dup_in_batch. The
    // corpus contributes only distinct 16-byte digests to the join —
    // never text, never a rescan per batch doc; the within-batch
    // dedup is one window over the digest. Synthesized delivery:
    // re-uploads of every 7th corpus doc, fresh revisions, and an
    // intra-batch double upload.
    "d13_incremental_dedup" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val batch =
        docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
        .unionAll(docs.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 520000L).as("doc_id"),
            concat(col("text"), lit(" fresh revision "),
              col("doc_id").cast("string")).as("text")))
        .unionAll(docs.filter(col("doc_id") % 31 === 0)
          .select((col("doc_id") + 600000L).as("doc_id"),
            concat(col("text"), lit(" batch special")).as("text")))
        .unionAll(docs.filter(col("doc_id") % 31 === 0)
          .select((col("doc_id") + 610000L).as("doc_id"),
            concat(col("text"), lit(" batch special")).as("text")))
      val corpusDigests = docs
        .select(Portable.md5bin(Portable.normText(col("text"))).as("h")).distinct()
        .withColumn("in_corpus", lit(true))
      val wFirst = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      batch
        .select(col("doc_id"), Portable.md5bin(Portable.normText(col("text"))).as("h"))
        .withColumn("rn", row_number().over(wFirst))
        .join(broadcast(corpusDigests), Seq("h"), "left")
        .withColumn("status",
          when(col("in_corpus"), "dup_of_corpus")
            .when(col("rn") > 1, "dup_in_batch")
            .otherwise("ingested"))
        .select(col("doc_id"), col("status"))
        .orderBy(col("doc_id"))
    },

    // Per-source dedup yield — the crawl-ops table that decides which
    // domains to throttle or re-prioritize: exact-dup rate stratified
    // by the document's source. Duplicate digests concentrate where
    // mirrors/boilerplate live, so a flat corpus-wide rate hides the
    // domain that produces them. Shuffles (source, 16-byte digest)
    // pairs into a sources-sized rollup — one scan at any corpus
    // size.
    "d16_source_dup_rate" -> { (s, d) =>
      sourceDupStats(withExactDupes(s, d)).orderBy(col("source"))
    },

    // MinHash calibration audit — the parameter QA for the whole d2/
    // d3/d4 stack: for every LSH candidate pair, the Jaccard ESTIMATE
    // the 16-slot signature implies (fraction of agreeing minima)
    // against the EXACT shingle Jaccard, with the absolute error. An
    // operator reads this table before changing K or the band layout:
    // if the estimate diverges, band thresholds are lying about the
    // similarity they gate on. Costs one signature pass + the d4-style
    // candidates-only exact verify — never all pairs.
    "d15_minhash_calibration" -> { (s, d) =>
      // ONE signature pass feeds BOTH the band join (candidate
      // mining) and the per-slot agreement columns: the materialized
      // table sits behind a single exchange every consumer reuses
      // (the previous form called lshPairs, which re-derived
      // signatures — two full km_minhash corpus passes).
      val sigs = kmSignatures(withNearDupes(s, d), materialize = true)
      val cand = lshPairsFrom(sigs)
      val agree = (0 until K).map(i =>
        when(col(s"a_s$i") === col(s"b_s$i"), 1).otherwise(0)).reduce(_ + _)
      val candIds = cand.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      // signatures ship candidates-only, like the shingle sets below:
      // semi-join BEFORE broadcast, so the corpus-sized signature
      // table is never the broadcast build side.
      val candSigs = sigs.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      val sa = candSigs.select(col("doc_id").as("doc_a") +:
        (0 until K).map(i => col(s"s$i").as(s"a_s$i")): _*)
      val sb = candSigs.select(col("doc_id").as("doc_b") +:
        (0 until K).map(i => col(s"s$i").as(s"b_s$i")): _*)
      val docsSh = withNearDupes(s, d)
        .join(broadcast(candIds), Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          graft.functions.TextHash.distinctShingles(col("text"), ShingleN).as("sh"))
      cand
        .join(broadcast(sa), Seq("doc_a"))
        .join(broadcast(sb), Seq("doc_b"))
        .join(broadcast(docsSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))), Seq("doc_a"))
        .join(broadcast(docsSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))), Seq("doc_b"))
        .withColumn("est", agree.cast("double") / lit(K))
        .withColumn("ex", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
        .select(col("doc_a"), col("doc_b"),
          round(col("est"), 6).as("est_jaccard"),
          round(col("ex"), 6).as("jaccard"),
          round(abs(col("est") - col("ex")), 6).as("abs_err"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Cross-corpus NEAR-dup screening — d13's exact digest check
    // extended to minhash: a new delivery's band hashes join the
    // corpus's band hashes, so lightly-edited re-uploads (which no
    // digest can catch) surface as candidates WITHOUT comparing the
    // batch against corpus text. Both sides ship 16-long signatures →
    // 4 band hashes per doc; the join is (band, hash)-keyed, so the
    // batch×corpus product never materializes. Planted: appended-tail
    // near-dups of every 15th doc (MUST mostly match — an unchanged
    // band survives the edit w.h.p.) and novel synthetic docs with
    // disjoint shingles (must mostly not).
    "d14_cross_corpus_lsh" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val batch = docs.filter(col("doc_id") % 15 === 0)
        .select((col("doc_id") + 700000L).as("doc_id"),
          concat(col("text"), lit(" extra tail words")).as("text"))
        .unionAll(docs.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 720000L).as("doc_id"),
            concat_ws(" ", transform(sequence(lit(0), lit(29)),
              i => concat(lit("novel"),
                pmod(col("doc_id") + lit(720000L) + i.cast("long") * lit(37L),
                  lit(99991L)).cast("string")))).as("text")))
      def bandsOf(df: DataFrame): DataFrame =
        kmSignatures(df, materialize = true).select(col("doc_id"),
          posexplode(array((0 until Bands).map { b =>
            md5(concat_ws("|", (0 until 4).map(r => col(s"s${b * 4 + r}")): _*).cast("binary"))
          }: _*)).as(Seq("band_id", "band_hash")))
      val corpusBands = bandsOf(docs)
        .select(col("band_id"), col("band_hash"), col("doc_id").as("corpus_id"))
      val matches = bandsOf(batch)
        .join(corpusBands, Seq("band_id", "band_hash"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("corpus_id")).as("n_candidates"))
      batch.select(col("doc_id"))
        .join(matches, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          (coalesce(col("n_candidates"), lit(0L)) > 0L).as("matched"))
        .orderBy(col("doc_id"))
    },

    // Dedup-yield scaling curve — the capacity-planning table for the
    // question every dedup deployment faces: the duplicate rate
    // measured on a sample UNDERSTATES what the full corpus will
    // show, because a pair is only visible when BOTH members land in
    // the sample. Four nested deterministic hash subsets (25/50/75/
    // 100% — nested so each level adds corpus rather than redrawing
    // it) each report their exact-dup rate; the curve's growth is the
    // empirical correction factor for extrapolating yield to 10×
    // corpus. One scan computes every doc's level bucket map-side;
    // each level is a digest-keyed aggregate — the d1 shape, four
    // conditional counts wide, no extra scans.
    "d18_dup_curve" -> { (s, d) =>
      val docs = withExactDupes(s, d)
        .select(col("doc_id"),
          Portable.md5bin(Portable.normText(col("text"))).as("h"),
          pmod(Portable.hash60(concat(lit("lvl|"), col("doc_id").cast("string"))),
            lit(100L)).as("bucket"))
      val levels = Seq(25, 50, 75, 100)
      val levelCounts = levels.map(l =>
        sum(when(col("bucket") < l, 1L).otherwise(0L)).as(s"n$l"))
      val perHash = docs.groupBy(col("h"))
        .agg(levelCounts.head, levelCounts.tail: _*)
      val rollups = levels.flatMap(l => Seq(
        sum(col(s"n$l")).as(s"docs$l"),
        sum(when(col(s"n$l") > 1, col(s"n$l") - 1).otherwise(0L)).as(s"dups$l")))
      perHash.agg(rollups.head, rollups.tail: _*)
        .select(explode(array(levels.map(l => struct(
          lit(l.toLong).as("level"),
          col(s"docs$l").as("n_docs"),
          col(s"dups$l").as("n_dups"),
          round(col(s"dups$l").cast("double") / col(s"docs$l"), 6).as("dup_rate"))): _*)).as("r"))
        .select(col("r.level"), col("r.n_docs"), col("r.n_dups"), col("r.dup_rate"))
        .orderBy(col("level"))
    },

    // Asymmetric-containment detection (Broder bottom-k sketch as the
    // blocking key): Jaccard LSH (d3/d4) structurally misses SUBSET
    // duplication — a truncated re-upload, a quoted doc embedded in a
    // larger one — because J(A,B) ≈ |A|/|B| stays small even when
    // A ⊂ B entirely. The right measure is containment
    // C(A→B) = |A∩B|/|A|, and its blocking key is the bottom-k
    // sketch: each doc's k smallest shingle hashes become join
    // anchors, and if C(A→B) ≥ c then each of A's anchors lies in B
    // with probability ≥ c, so a candidate pair is missed only when
    // B's own bottom-k avoids ALL of A's shingles — P ≈ (1−c)^k,
    // deterministic on a fixed corpus. Candidates join on anchor
    // equality (never all-pairs: anchor groups are dup families, not
    // the corpus). Two fanout defenses, both required at scale:
    // (1) d17 shingles are FIVE words wide, not d4's three — blocking
    // hinges on anchors being identity-bearing, and in a
    // small-vocabulary corpus 3-gram bottom hashes collide corpus-
    // wide PAIRWISE even when no single anchor is hot (measured at
    // sf0.1: 143k candidate pairs — essentially all-pairs — vs 998 at
    // width 5, planted recall 98% either way); (2) anchors with
    // doc-frequency > MaxAnchorDf (stock phrases, not identity) are
    // dropped, bounding any one group at C(MaxAnchorDf, 2) pairs.
    // Containment is measured in the SAME 5-word shingle space, and
    // exact sets are computed ONLY for candidate ids, d4-style.
    // Planted: every 9th doc re-uploaded truncated to its first 40%
    // of words — pure subset duplication invisible to a 0.5-Jaccard
    // gate.
    "d17_containment" -> { (s, d) =>
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val wBase = base.withColumn("w", Portable.words(col("text")))
      val trunc = wBase
        .filter(col("doc_id") % 9 === 0 && size(col("w")) >= 8)
        .select((col("doc_id") + 600000L).as("doc_id"),
          concat_ws(" ",
            slice(col("w"), lit(1),
              floor(size(col("w")) * lit(0.4)).cast("int"))).as("text"))
      val sh = base.unionAll(trunc)
        .select(col("doc_id"),
          graft.functions.TextHash.distinctShingles(col("text"), D17ShingleN).as("sh"))
        .filter(size(col("sh")) > 0)
        .localCheckpoint()
      val rawAnchors = sh.select(col("doc_id"),
        explode(slice(array_sort(
          transform(col("sh"), x => md5(x.cast("binary")))), 1, AnchorK)).as("anchor"))
      val coldAnchors = rawAnchors.groupBy(col("anchor"))
        .agg(count(lit(1)).as("adf"))
        .filter(col("adf") <= MaxAnchorDf)
        .select(col("anchor"))
      val anchors = rawAnchors.join(coldAnchors, Seq("anchor"), "left_semi")
      val l = anchors.as("l"); val r = anchors.as("r")
      val cand = l.join(r, col("l.anchor") === col("r.anchor") &&
          col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .distinct()
      val candIds = cand.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val candSh = sh.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      cand
        .join(broadcast(candSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))), Seq("doc_a"))
        .join(broadcast(candSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))), Seq("doc_b"))
        .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("containment_a",
          round(col("n_common").cast("double") / size(col("sh_a")), 6))
        .withColumn("containment_b",
          round(col("n_common").cast("double") / size(col("sh_b")), 6))
        .filter(greatest(col("containment_a"), col("containment_b")) >= 0.9)
        .withColumn("relation",
          when(col("containment_a") >= 0.9 && col("containment_b") >= 0.9, "mutual")
            .when(col("containment_a") >= 0.9, "a_in_b")
            .otherwise("b_in_a"))
        .select(col("doc_a"), col("doc_b"),
          size(col("sh_a")).cast("long").as("n_sh_a"),
          size(col("sh_b")).cast("long").as("n_sh_b"),
          col("containment_a"), col("containment_b"), col("relation"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Bloom-filter membership probe + its false-positive audit — the
    // BOUNDED-size incremental dedup primitive next to d13's exact
    // digest store: the filter is m bits regardless of corpus size
    // and merges by bitwise OR (here: a distinct set of ≤ m bit
    // positions, the relational encoding of the bitset), so a fleet
    // of ingest workers can each build one over their slice and union
    // them for free — while d13's store grows with the corpus and
    // must be joined against. The price is false positives, so the
    // operator IS the acceptance audit (q41/q45/t22's pattern): base
    // corpus → k=4 seeded bit positions per content digest; probes
    // (fresh docs + re-uploads under new ids) predict dup when ALL k
    // bits are set; the exact digest join supplies ground truth, and
    // the contingency table carries the observed classes next to the
    // theoretical (1-(1-1/m)^(kn))^k rate. m=1024 is deliberately
    // small so false positives actually occur at test SF — the audit
    // has to have something to catch. Recall is exact by
    // construction: a bloom never false-negatives, and the spec-free
    // proof is in the table (no predicted=false, actual=true row).
    "d19_bloom_probe" -> { (s, d) =>
      val m = BloomBits
      val k = BloomK
      // d19 keeps the HEX digest: bloomPositions derives its k bit
      // positions by re-hashing the digest TEXT ("bloom$i|" + h), and
      // the DuckDB oracle mirrors that over md5()'s hex form — the
      // binary representation would change every derived position
      val docs = Tables.documents(s, d).select(col("doc_id"),
        Portable.md5hex(Portable.normText(col("text"))).as("h"))
      val base = docs.filter(col("doc_id") % 7 =!= 3)
      val probes = docs.filter(col("doc_id") % 7 === 3)
        .unionByName(base.filter(col("doc_id") % 11 === 0)
          .withColumn("doc_id", col("doc_id") + 900000L))
      val baseBits = bloomOf(base)
      val baseH = base.select(col("h")).distinct()
      val stats = baseBits.agg(count(lit(1)).as("n_bits_set"))
        .crossJoin(baseH.agg(count(lit(1)).as("n_base")))
        .crossJoin(probes.agg(count(lit(1)).as("n_probes")))
      val hits = bloomProbe(probes, baseBits)
      val actual = hits.join(
        broadcast(baseH.withColumn("actual_dup", lit(true))), Seq("h"), "left")
        .withColumn("actual_dup", coalesce(col("actual_dup"), lit(false)))
      actual.groupBy(col("predicted_dup"), col("actual_dup"))
        .agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(stats))
        .select(col("predicted_dup"), col("actual_dup"), col("n_docs"),
          round(col("n_docs").cast("double") / col("n_probes"), 6).as("share"),
          col("n_bits_set"),
          round(col("n_bits_set").cast("double") / m, 6).as("fill_ratio"),
          round(pow(lit(1.0) - pow(lit(1.0) - lit(1.0) / m,
            col("n_base").cast("double") * k), k), 6).as("expected_fp_rate"))
        .orderBy(col("predicted_dup"), col("actual_dup"))
    },

    // LSH band-layout TUNING (round 10) — d15 calibrates the
    // signature's Jaccard estimate; this picks the BAND GEOMETRY the
    // d3/d14 screens run with. For each (b bands × r rows) factoring
    // of the same K=16 signature, the S-curve midpoint (1/b)^(1/r)
    // says which similarity the layout targets ANALYTICALLY, and the
    // corpus says what it does EMPIRICALLY: candidate volume (the
    // verify-stage bill, Σ C(n,2) over band-bucket sizes — counted
    // from bucket SIZES, never by generating pairs) and recall of
    // the planted near-dup pairs (truth-probe joins against the band
    // table). All four layouts band the one materialized signature
    // relation; tuning costs one screen pass, not four, and no stage
    // is quadratic in a bucket — which matters precisely because the
    // flood this operator measures would otherwise be the flood it
    // pays. The table reads as: 16x1 catches everything and floods
    // verify; 2x8 is nearly free and misses; 4x4 (the production
    // layout) sits on the knee. At 100 TB the pair explosion is the
    // whole dedup bill — this is the operator that prices it before
    // anyone re-bands a corpus.
    "d21_band_layout" -> { (s, d) =>
      val layouts = Seq((16, 1), (8, 2), (4, 4), (2, 8))
      // two planted similarity classes so the S-curve spread is
      // OBSERVABLE, not just analytic: appended-tail copies sit at
      // J ≈ 0.9 (every layout should catch them) and doubled copies —
      // the doc's own words plus a unique-vocabulary echo — at
      // J ≈ 0.47 (2x8 must miss most, 16x1 must catch all: the mid
      // class is where the layouts actually disagree)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = docs
        .unionAll(docs.filter(col("doc_id") % 20 === 0)
          .withColumn("doc_id", col("doc_id") + 100000L)
          .withColumn("text", concat(col("text"), lit(" extra tail words"))))
        .unionAll(docs.filter(col("doc_id") % 20 === 10)
          .select(col("doc_id").as("orig_id"), col("text"))
          .select((col("orig_id") + 300000L).as("doc_id"),
            array_join(concat(Portable.words(col("text")),
              transform(Portable.words(col("text")),
                x => concat(x, lit("_z"), col("orig_id").cast("string")))), " ")
              .as("text")))
      val sigs = kmSignatures(corpus, materialize = true)
      val bands = sigs.select(col("doc_id"),
        explode(array(layouts.flatMap { case (b, r) =>
          (0 until b).map { bi =>
            struct(lit(s"${b}x$r").as("layout"), lit(bi).as("band_id"),
              md5(concat_ws("|",
                (0 until r).map(j => col(s"s${bi * r + j}")): _*).cast("binary"))
                .as("band_hash"))
          }
        }: _*)).as("e"))
        .select(col("doc_id"), col("e.layout").as("layout"),
          col("e.band_id").as("band_id"), col("e.band_hash").as("band_hash"))
      // NO pair enumeration anywhere (round 16 — the second scale
      // decade named this operator's old clique self-join: 16x1's
      // single-minhash buckets grow LINEARLY with the corpus — any
      // two docs whose min shingle ties, e.g. on a corpus-common
      // stopword shingle, share a bucket — so distinct-pair
      // materialization was quadratic; sf1→sf10 exponent 1.15,
      // measured). The three consumers each have a linear form:
      // the verify BILL per layout is Σ C(n,2) over bucket sizes —
      // a groupBy count, no pairs generated — and recall only needs
      // the planted truth pairs PROBED against the band table
      // (found ⟺ some band matches), a truth-sized broadcast join.
      // n_candidates therefore counts pair-generation incidences
      // (a pair colliding in k bands bills k times) — the work a
      // screen pass actually performs, which is the quantity a
      // layout decision must price; the oracle mirrors the same
      // definition.
      val volume = bands
        .groupBy(col("layout"), col("band_id"), col("band_hash"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("layout"))
        .agg(sum(expr("n * (n - 1) div 2")).as("n_candidates"))
      // planted truth, per class: (orig, orig+offset) with both ends
      // signature-bearing
      def truthAt(mod: Long, offset: Long) =
        sigs.filter(col("doc_id") % 20 === mod && col("doc_id") < 100000L)
          .select(col("doc_id").as("doc_a"))
          .join(sigs.filter(col("doc_id") >= 100000L)
            .select((col("doc_id") - offset).as("doc_a")), "doc_a")
          .select(col("doc_a"), (col("doc_a") + offset).as("doc_b"))
      val truthHigh = truthAt(0L, 100000L)
      val truthMid = truthAt(10L, 300000L)
      val stats = truthHigh.agg(count(lit(1)).as("n_high"))
        .crossJoin(truthMid.agg(count(lit(1)).as("n_mid")))
        .crossJoin(sigs.agg(count(lit(1)).as("n_docs")))
      // No hard broadcast hints on truth or aB: both grow linearly
      // with the corpus (truth ≈ n/20 pairs, aB = truth × ~30 band
      // rows), so at production scale a forced broadcast would hit
      // the size cap and FAIL the query instead of degrading to a
      // shuffle join. The join keys (doc_a; the 4-col band key) keep
      // a shuffle join linear, and AQE broadcasts at runtime whenever
      // the build side is actually small — at the bench SFs the plan
      // is the same BroadcastHashJoin as before, chosen by AQE from
      // measured sizes instead of ordered by hint (r16 ADVICE).
      def foundIn(truth: DataFrame, as: String) = {
        val aB = bands.as("ab")
          .join(truth.as("t"), col("ab.doc_id") === col("t.doc_a"))
          .select(col("t.doc_a").as("doc_a"), col("t.doc_b").as("doc_b"),
            col("ab.layout").as("layout"), col("ab.band_id").as("band_id"),
            col("ab.band_hash").as("band_hash"))
        aB.as("x").join(bands.as("bb"),
            col("x.doc_b") === col("bb.doc_id") &&
              col("x.layout") === col("bb.layout") &&
              col("x.band_id") === col("bb.band_id") &&
              col("x.band_hash") === col("bb.band_hash"))
          .select(col("x.layout").as("layout"),
            col("x.doc_a").as("doc_a"), col("x.doc_b").as("doc_b"))
          .distinct()
          .groupBy(col("layout")).agg(count(lit(1)).as(as))
      }
      import s.implicits._
      val meta = layouts.map { case (b, r) =>
        (s"${b}x$r", b.toLong, r.toLong, math.pow(1.0 / b, 1.0 / r))
      }.toDF("layout", "n_bands", "rows_per_band", "threshold")
        .withColumn("threshold", round(col("threshold"), 6))
      // hint the BUILD side: a left-outer join can only broadcast its
      // right (non-preserved) side — hinting the preserved side is
      // ignored with a per-analysis HintErrorLogger WARN
      meta.join(broadcast(volume), Seq("layout"), "left")
        .join(broadcast(foundIn(truthHigh, "f_high")), Seq("layout"), "left")
        .join(broadcast(foundIn(truthMid, "f_mid")), Seq("layout"), "left")
        .crossJoin(broadcast(stats))
        .select(col("layout"), col("n_bands"), col("rows_per_band"),
          col("threshold"),
          coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
          round(coalesce(col("n_candidates"), lit(0L)).cast("double") /
            col("n_docs"), 6).as("cand_per_doc"),
          col("n_high"),
          round(coalesce(col("f_high"), lit(0L)).cast("double") /
            col("n_high"), 6).as("high_recall"),
          col("n_mid"),
          round(coalesce(col("f_mid"), lit(0L)).cast("double") /
            col("n_mid"), 6).as("mid_recall"))
        .orderBy(col("n_bands").desc)
    },

    // Duplicated-SUBSTRING span detection (the Lee et al.
    // "Deduplicating Training Data" exact-substring step, re-expressed
    // relationally): whole-doc and segment dedup both miss a long
    // passage copied INTO an otherwise-distinct doc, and training on
    // the repeated passage is what memorization studies actually
    // penalize. Suffix arrays don't distribute; the MapReduce-standard
    // approximation is overlapping fixed-width window digests —
    // every 10-word stride-1 window hashes to 16 bytes, windows seen
    // in ≥2 docs are duplicated, and per doc the dup windows merge
    // into MAXIMAL word-space spans (interval merge via lag + running
    // sum — a new span starts when the next window clears the
    // previous one's reach). The corpus plants the failure mode:
    // every 6th doc spawns a copy (ids ≥ 500000) sharing its first
    // 30 words but with a unique-vocabulary tail, detectable ONLY at
    // span granularity. Shuffles carry (doc_id, widx, digest) —
    // window TEXT never moves; at 100 TB this is t21's segment shape
    // fanned ~10× (stride 1 vs stride 10), the price of exact span
    // boundaries.
    "d20_span_dedup" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), Portable.words(col("text")).as("w"))
      // two-step select: lateral alias resolution would bind the
      // lambda's doc_id to the +500000 alias, not the child column
      val planted = docs.filter(col("doc_id") % 6 === 0)
        .select(col("doc_id").as("orig_id"), col("w"))
        .select((col("orig_id") + 500000L).as("doc_id"),
          concat(slice(col("w"), 1, 30),
            transform(slice(col("w"), 31, 20),
              x => concat(x, lit("_"), col("orig_id").cast("string")))).as("w"))
      spanDedupOf(docs.unionAll(planted)).orderBy(col("doc_id"))
    }
  )

  /** d20's whole-operator core over any (doc_id, w: array<string>)
    * corpus — window digests, cross-doc dup marking, interval merge
    * into maximal spans, per-doc rollup with the keep decision.
    * Shared by the pack query (which adds its planted corpus) and
    * the DSL facade. */
  def spanDedupOf(corpus: DataFrame): DataFrame = {
    val w = SpanW
    val wins = spanWindows(corpus)
    val dupH = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val spans = wins.join(dupH, "h")
      .withColumn("newspan",
        when(col("i") - lag(col("i"), 1).over(wOrd) > w, 1L).otherwise(0L))
      .withColumn("grp", sum(col("newspan")).over(wOrd))
      .groupBy(col("doc_id"), col("n_words"), col("grp"))
      .agg(min(col("i")).as("s"),
        (max(col("i")) + (w - 1)).as("e"),
        count(lit(1)).as("nw"))
    spans.groupBy(col("doc_id"), col("n_words"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("nw")).as("n_dup_windows"),
        max(col("e") - col("s") + 1).as("max_span_words"),
        sum(col("e") - col("s") + 1).as("covered_words"))
      .withColumn("dup_frac",
        round(col("covered_words").cast("double") / col("n_words"), 6))
      .withColumn("keep", col("dup_frac") <= 0.5)
      .select(col("doc_id"), col("n_words"), col("n_dup_windows"),
        col("n_spans"), col("max_span_words"), col("covered_words"),
        col("dup_frac"), col("keep"))
  }

  /** d20: duplicated-span window width (words, stride 1). */
  private[graft] val SpanW = 10

  /** d20's stride-1 window digests over any (doc_id, w: array<string>)
    * frame: one row per window, (doc_id, n_words, i, h) — shared by
    * the batch query and the incremental ingest step
    * (streaming.DataPrep.spanDedupStep). Docs shorter than [[SpanW]]
    * words have no windows and drop out. */
  private[graft] def spanWindows(docs: DataFrame): DataFrame =
    docs.withColumn("n_words", size(col("w")).cast("long"))
      .filter(col("n_words") >= SpanW)
      .select(col("doc_id"), col("n_words"),
        posexplode(transform(sequence(lit(1L), col("n_words") - (SpanW - 1)),
          i => Portable.md5bin(array_join(slice(col("w"), i.cast("int"), lit(SpanW)), " "))))
          .as(Seq("pos", "h")))
      .select(col("doc_id"), col("n_words"),
        (col("pos") + 1).cast("long").as("i"), col("h"))

  /** d12: centroid seed stride + within-cell near-dup threshold +
    * hot-cell block bound. */
  private val SemCentStride = 50
  private val SemDupCos = 0.98
  private val SemMaxCell = 64

  /** d17: bottom-k containment-sketch width — miss probability for a
    * containment-c pair is ≈ (1−c)^k; at c = 0.9, k = 8 that is 1e-8 —
    * the d17 shingle width (5 words: anchors must be identity-bearing;
    * see the operator comment), and the stop-shingle cap: anchors seen
    * in more than MaxAnchorDf docs are corpus vocabulary, not
    * identity, and are dropped so no anchor group's pair fanout
    * exceeds C(MaxAnchorDf, 2). */
  private val AnchorK = 8
  private val D17ShingleN = 5
  private val MaxAnchorDf = 64

  /** SemDeDup-style within-cell near-dup pair mining with a HOT-CELL
    * BOUND. Every vector is assigned to its nearest broadcast centroid
    * (the IVF pass a3/a10 share); a cell's members are then ordered by
    * centroid affinity and split into blocks of at most `maxCell`
    * rows, and the pair self-join keys on (cell, block). The largest
    * join group is therefore `maxCell` rows and per-cell candidate
    * work is ceil(n/maxCell)·C(maxCell,2) — LINEAR in the cell, where
    * the round-6 form was quadratic in the hottest cell (the skew a10
    * audits but nothing previously acted on; at 100 TB one dense
    * cluster degraded the whole job). Near-identical vectors have
    * near-identical centroid affinity, so dup pairs co-locate in a
    * block w.h.p.; a pair straddling a block boundary is the
    * documented price of boundedness, and the DuckDB oracle mirrors
    * the same blocking so both engines see identical semantics.
    *
    * @param corpus (vec_id, emb, nrm)
    * @param cents  (cent_id, c_emb, c_nrm) — broadcast-sized
    * @param minCos near-dup cosine threshold
    * @param maxCell max members compared as one block within a cell
    */
  def semanticDedupPairs(corpus: DataFrame, cents: DataFrame,
                         minCos: Double, maxCell: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cos = graft.functions.Vec.dot(col("emb"), col("c_emb")) /
      (col("nrm") * col("c_nrm"))
    val byVec = Window.partitionBy(col("vec_id")).orderBy(cos.desc, col("cent_id"))
    val assigned = corpus.crossJoin(broadcast(cents))
      .withColumn("c_cos", cos)
      .withColumn("crank", row_number().over(byVec))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("emb"), col("nrm"),
        col("cent_id").as("cell"), col("c_cos"))
    val byCell = Window.partitionBy(col("cell"))
      .orderBy(col("c_cos").desc, col("vec_id"))
    val blocked = assigned
      .withColumn("blk", floor((row_number().over(byCell) - 1) / lit(maxCell)))
      .select(col("cell"), col("blk"), col("vec_id"), col("emb"), col("nrm"))
    val l = blocked.select(col("cell"), col("blk"), col("vec_id").as("keep_id"),
      col("emb").as("a_emb"), col("nrm").as("a_nrm"))
    val r = blocked.select(col("cell"), col("blk"), col("vec_id").as("dup_id"),
      col("emb").as("b_emb"), col("nrm").as("b_nrm"))
    l.join(r, Seq("cell", "blk")).filter(col("keep_id") < col("dup_id"))
      .withColumn("cosine", graft.functions.Vec.dot(col("a_emb"), col("b_emb")) /
        (col("a_nrm") * col("b_nrm")))
      .filter(col("cosine") >= minCos)
      .select(col("cell"), col("keep_id"), col("dup_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** The shared passage d11 plants across documents. */
  private val Boilerplate =
    "important legal disclaimer all rights reserved do not redistribute " +
      "this document without permission from the owner thank you kindly"

  /** Hamming-distance-≤ `maxDist` fingerprint pairs (see d10 notes).
    * `nBlocks` must exceed `maxDist` for the pigeonhole guarantee.
    * Runs over the near-dup corpus: a perturbed copy's simhash
    * differs in only the bit positions its few new tokens flip. */
  def hammingPairs(s: SparkSession, d: String, maxDist: Int = 3,
                   nBlocks: Int = 4, width: Int = 32): DataFrame = {
    require(nBlocks > maxDist, s"need > $maxDist blocks for exactness")
    require(width % nBlocks == 0, "block width must divide the fingerprint")
    val blockW = width / nBlocks
    val mask = (1 << blockW) - 1
    val sigs = withNearDupes(s, d)
      .select(col("doc_id"),
        graft.functions.TextHash.simHashW(col("text"), width).as("sig"))
      .filter(col("sig").isNotNull)
      // materialize the (id, long) relation once behind an exchange:
      // both self-join sides reuse it instead of re-hashing the corpus
      .repartition(col("doc_id"))
    val blocks = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until nBlocks).map(b =>
        expr(s"shiftright(sig, ${blockW * b}) & $mask")): _*)).as(Seq("b", "v")))
    val lhs = blocks.select(col("b"), col("v"),
      col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val rhs = blocks.select(col("b"), col("v"),
      col("doc_id").as("id_b"), col("sig").as("sig_b"))
    lhs.join(rhs, Seq("b", "v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct() // a pair may agree on several blocks
      .withColumn("dist", expr("bit_count(sig_a ^ sig_b)").cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Embedding near-dup: cosine ≥ 0.95 pairs. The corpus has none
    * (max natural cosine ≈ 0.48), so scaled copies are unioned in —
    * cosine is scale-invariant, so exactly those pairs surface.
    * Banded by coarse sign-bucket so the self-join never goes O(n²)
    * at scale; `signBits` controls bucket granularity (a true scaled
    * copy shares EVERY sign bit, so any signBits is exact for the
    * synthesized dupes — at real scale raise it until bucket
    * occupancy fits the pairwise-compare budget).
    */
  def embeddingDup(s: SparkSession, d: String, signBits: Int = 4): DataFrame = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val dupes = base.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("emb"), _ * 1.5).as("emb"))
    val all = base.unionAll(dupes)
      .withColumn("nrm", graft.functions.Vec.norm(col("emb")))
      .withColumn("bucket", concat(
        (0 until signBits).map(i => when(element_at(col("emb"), i + 1) >= 0, "1").otherwise("0")): _*))
    val l = all.as("l"); val r = all.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"),
        (graft.functions.Vec.dot(col("l.emb"), col("r.emb")) /
          (col("l.nrm") * col("r.nrm"))).as("cosine"))
      .filter(col("cosine") >= 0.95)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** The d3 band-join candidate pairs (shared base for d3/d9). */
  private[graft] def lshPairs(s: SparkSession, d: String): DataFrame =
    lshPairsFrom(kmSignatures(withNearDupes(s, d), materialize = true))

  /** The per-doc (band_id, band_hash) rows both candidate forms
    * share: [[Bands]] 4-row band hashes off the 16-minhash
    * signature. */
  private def lshBands(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      posexplode(array((0 until Bands).map { b =>
        md5(concat_ws("|", (0 until 4).map(r => col(s"s${b * 4 + r}")): _*).cast("binary"))
      }: _*)).as(Seq("band_id", "band_hash")))

  /** Band join over an ALREADY-materialized signature table — lets a
    * caller that also needs the raw signatures (d15) pay for exactly
    * one km_minhash corpus pass shared by every consumer.
    *
    * This is the EXACT all-pairs-per-bucket form: per (band, hash)
    * bucket of size n it emits C(n,2) rows — the contract d3 (the
    * pair audit) and d15 (per-pair slot-agreement calibration)
    * need, and QUADRATIC in the bucket when a mega-clique appears
    * (boilerplate duplicated across millions of pages — the round-16
    * sf10 measurement hit exactly this: 100-way replica cliques fed
    * C(100,2)×band rows into the distinct and one run spilled
    * >70 GB). A consumer that only needs CONNECTIVITY must use
    * [[lshStarEdges]] instead. */
  private[graft] def lshPairsFrom(sigs: DataFrame): DataFrame = {
    val bands = lshBands(sigs)
    val l = bands.as("l"); val r = bands.as("r")
    l.join(r, col("l.band_id") === col("r.band_id") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()
  }

  /** The LINEAR candidate form for connectivity consumers (d9, p7's
    * near-dup stage): per (band, hash) bucket, every member pairs
    * with the bucket's MIN doc_id only — n−1 star edges instead of
    * C(n,2) clique edges. Connected components over the star edges
    * are PROVABLY identical to components over [[lshPairsFrom]]'s
    * cliques: the band join connects u,v directly iff they share a
    * bucket, the star connects them through that bucket's hub, and
    * star edges are a subset of clique edges — so the transitive
    * closure is the same relation (DedupSpec asserts it, mega-bucket
    * included). This is the bound that makes bucket-skew survivable
    * at 100 TB: a million-way boilerplate clique costs 10⁶ edges,
    * not 5·10¹¹ — candidate volume stays linear in corpus size
    * regardless of dup-group structure, which no exact pair
    * enumeration can promise. */
  private[graft] def lshStarEdges(sigs: DataFrame): DataFrame = {
    // Hub = bucket min via groupBy + rejoin, NOT a window min: the
    // window form shipped every row of a bucket through one task
    // (sort + buffer/spill) — a straggler at exactly the
    // million-way-clique scale this function exists to survive. The
    // aggregate combines map-side (partial min per task, a
    // bucket-count-sized shuffle), and the rejoin streams the band
    // rows against the hubs build side — AQE broadcasts hubs when it
    // is small, and even the fallback shuffle hash join PROBES a
    // mega-bucket's rows without buffering them (only the one-row-
    // per-bucket build side is held). Callers pass materialized
    // signatures (kmSignatures(materialize = true)), so the band
    // explode's two consumers re-derive it from in-memory blocks,
    // not from a re-scan of the corpus. (r16 verdict #7 / ADVICE #4;
    // sf10 ONLY-mode A/B recorded in SCALING_MEASURED.md.)
    val bands = lshBands(sigs)
    val hubs = bands.groupBy(col("band_id"), col("band_hash"))
      .agg(min(col("doc_id")).as("hub"))
    bands.join(hubs, Seq("band_id", "band_hash"))
      .filter(col("doc_id") =!= col("hub"))
      .select(col("hub").as("doc_a"), col("doc_id").as("doc_b"))
      .distinct()
  }

  /** The BOUNDED cluster resolver (the former d8_dup_clusters
    * registry entry, demoted round 16 when d9 absorbed its keeper
    * columns): two rounds of min-label propagation over the pair
    * graph's edge list — exact for any dup graph of diameter ≤ 2
    * (LSH near-dup graphs are near-cliques), one edge-list shuffle
    * per round, one label per node of state, no driver-side graph.
    * Kept as the building block a latency-bounded deploy iterates
    * (run the SAME step to a fixpoint); DedupSpec proves it equals
    * the convergent operators.Components form on the LSH graph,
    * keeper semantics included. Emits (keep_id, n_members, max_doc),
    * d8's historical contract. */
  private[graft] def dupClustersTwoRound(pairsIn: DataFrame): DataFrame = {
    // repartition pins the pair list behind ONE exchange that all
    // three consumers (nodes + both edge directions) reuse — same
    // projection-collapse insurance as the d3/d4 signature
    // materialization (without it the band join can replan per
    // consumer).
    val pairs = pairsIn.repartition(col("doc_a"))
    val nodes = pairs.select(explode(array(col("doc_a"), col("doc_b"))).as("node"))
      .distinct()
    val edges = pairs.select(col("doc_a").as("node"), col("doc_b").as("nbr"))
      .unionAll(pairs.select(col("doc_b").as("node"), col("doc_a").as("nbr")))
      .unionAll(nodes.select(col("node"), col("node").as("nbr")))
    val l1 = edges.groupBy(col("node")).agg(min(col("nbr")).as("lbl"))
    val l2 = edges
      .join(l1.select(col("node").as("nbr"), col("lbl")), "nbr")
      .groupBy(col("node")).agg(min(col("lbl")).as("keep_id"))
    l2.groupBy(col("keep_id"))
      .agg(count(lit(1)).as("n_members"), max(col("node")).as("max_doc"))
      .orderBy(col("keep_id"))
  }

  /** words → shingles → per-shingle md5 halves → grouped signatures. */
  private def sigsSql(docsSql: String) =
    s"""docs AS ($docsSql),
       |words AS (
       |  SELECT doc_id, CASE WHEN trim(text) = '' THEN []::VARCHAR[]
       |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
       |  FROM docs),
       |shingled AS (
       |  SELECT doc_id, $ShinglesSql AS sh FROM words),
       |hashed AS (
       |  SELECT doc_id,
       |    ('0x' || substring(md5(s), 1, 8))::BIGINT AS h1,
       |    ('0x' || substring(md5(s), 9, 8))::BIGINT AS h2
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM shingled) t),
       |sigs AS (
       |  SELECT doc_id, ${(0 until K).map(i => s"${sigSql(i)} AS s$i").mkString(", ")}
       |  FROM hashed GROUP BY doc_id)""".stripMargin

  private val BandsSql = (0 until Bands).map { b =>
    val parts = (0 until 4).map(r => s"s${b * 4 + r}::VARCHAR").mkString(" || '|' || ")
    s"SELECT doc_id, $b AS band_id, md5($parts) AS band_hash FROM sigs"
  }.mkString("\n  UNION ALL\n  ")

  /** The whole signatures→bands→candidate-pairs CTE chain over an
    * arbitrary (doc_id, text) corpus SQL — the d3 mirror; also the
    * near-dup stage of Pipeline's p7 cascade oracle. Ends with
    * `cand(doc_a, doc_b)`. */
  private[graft] def candChainSql(docsSql: String): String =
    s"""${sigsSql(docsSql)},
       |bands AS (
       |  $BandsSql),
       |cand AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r
       |    ON l.band_id = r.band_id AND l.band_hash = r.band_hash
       |   AND l.doc_id < r.doc_id)""".stripMargin

  private val CandSql = candChainSql(NearDupesSql)

  def oracle: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM corpus
        |GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |HAVING count(*) > 1
        |ORDER BY keep_id""".stripMargin,

    "d2_minhash_sig" ->
      s"""WITH ${sigsSql("SELECT doc_id, text FROM documents")}
         |SELECT doc_id,
         |  concat_ws('|', ${(0 until K).map(i => s"s$i").mkString(", ")}) AS signature
         |FROM sigs
         |ORDER BY doc_id""".stripMargin,

    "d3_lsh_pairs" ->
      s"""WITH $CandSql
         |SELECT doc_a, doc_b FROM cand
         |ORDER BY doc_a, doc_b""".stripMargin,

    // Exact O(n²) Hamming scan — the completeness bound the blocked
    // Spark plan must reproduce bit-for-bit. 32-bit simhash: the
    // 8-hex-char md5 prefix, voting on bits below 32 (mirrors
    // graftvec.SimHashW).
    "d10_hamming_pairs" ->
      s"""WITH src AS ($NearDupesSql),
         |toks AS (
         |  SELECT doc_id,
         |    ('0x' || substring(md5(tok), 1, 8))::BIGINT AS h
         |  FROM (SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         |      ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
         |    FROM src) t),
         |bits AS (
         |  SELECT doc_id,
         |    ${(0 until 32).map(i =>
              s"sum(CASE WHEN CAST(floor(h / ${1L << i}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS b$i")
              .mkString(",\n    ")}
         |  FROM toks GROUP BY doc_id),
         |sig AS (
         |  SELECT doc_id,
         |    ${(0 until 32).map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS s
         |  FROM bits)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS dist
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    // Window-based chunk reconstruction — an independent formulation
    // of the kernel's one-pass chunker: per-word boundary flags, a
    // running boundary count as the chunk id, string_agg per chunk.
    "d11_cdc_chunks" ->
      s"""WITH src AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000 AS doc_id, '$Boilerplate' || ' ' || text AS text
         |  FROM documents WHERE doc_id % 5 = 0),
         |w0 AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
         |  FROM src WHERE trim(text) <> ''),
         |words AS (
         |  SELECT doc_id, ws[i] AS w, i AS ord
         |  FROM w0, unnest(range(1, len(ws) + 1)) AS t(i)),
         |b AS (
         |  SELECT doc_id, w, ord,
         |    CASE WHEN ('0x' || substring(md5(w), 1, 8))::BIGINT % 8 = 0
         |      THEN 1 ELSE 0 END AS is_b
         |  FROM words),
         |c AS (
         |  SELECT doc_id, w, ord,
         |    COALESCE(sum(is_b) OVER (PARTITION BY doc_id ORDER BY ord
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_seq
         |  FROM b),
         |chunks AS (
         |  SELECT doc_id, chunk_seq, string_agg(w, ' ' ORDER BY ord) AS chunk
         |  FROM c GROUP BY doc_id, chunk_seq),
         |fps AS (
         |  SELECT doc_id, ('0x' || substring(md5(chunk), 1, 15))::BIGINT AS fp
         |  FROM chunks)
         |SELECT fp, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
         |FROM fps
         |GROUP BY fp
         |HAVING count(DISTINCT doc_id) > 1
         |ORDER BY fp""".stripMargin,

    // Independent formulation of d9: recursive reachability (labels =
    // every node reachable from me; component id = min of them).
    // Carries the keeper audit columns folded in from the retired d8
    // oracle (comp_id IS the min-id keeper; max_doc the roster edge).
    "d9_dup_components" ->
      s"""WITH RECURSIVE $CandSql,
         |nodes AS (
         |  SELECT DISTINCT node FROM (
         |    SELECT doc_a AS node FROM cand
         |    UNION ALL SELECT doc_b AS node FROM cand) t),
         |edges AS (
         |  SELECT doc_a AS node, doc_b AS nbr FROM cand
         |  UNION ALL SELECT doc_b AS node, doc_a AS nbr FROM cand),
         |reach(node, lbl) AS (
         |  SELECT node, node AS lbl FROM nodes
         |  UNION
         |  SELECT e.node, r.lbl
         |  FROM edges e JOIN reach r ON e.nbr = r.node),
         |comp AS (
         |  SELECT node, CAST(min(lbl) AS BIGINT) AS comp_id
         |  FROM reach GROUP BY node)
         |SELECT comp_id, count(*) AS n_members,
         |  CAST(max(node) AS BIGINT) AS max_doc,
         |  string_agg(node::VARCHAR, ',' ORDER BY node) AS members
         |FROM comp
         |GROUP BY comp_id
         |ORDER BY comp_id""".stripMargin,

    "d16_source_dup_rate" ->
      """WITH corpus AS (
        |  SELECT source, text FROM documents
        |  UNION ALL
        |  SELECT source, text FROM documents WHERE doc_id % 10 = 0),
        |hashed AS (
        |  SELECT source,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
        |  FROM corpus)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
        |  round(1.0 - count(DISTINCT h)::DOUBLE / count(*), 6) AS dup_rate
        |FROM hashed
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "d15_minhash_calibration" -> {
      val agree = (0 until K).map(i =>
        s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH $CandSql,
         |distinct_sh AS (
         |  SELECT doc_id, list_distinct(sh) AS dsh FROM shingled),
         |scored AS (
         |  SELECT c.doc_a, c.doc_b,
         |    ($agree) / ${K}.0 AS est,
         |    len(list_intersect(da.dsh, db.dsh))::DOUBLE /
         |      (len(da.dsh) + len(db.dsh) - len(list_intersect(da.dsh, db.dsh))) AS ex
         |  FROM cand c
         |  JOIN sigs a ON c.doc_a = a.doc_id
         |  JOIN sigs b ON c.doc_b = b.doc_id
         |  JOIN distinct_sh da ON c.doc_a = da.doc_id
         |  JOIN distinct_sh db ON c.doc_b = db.doc_id)
         |SELECT doc_a, doc_b,
         |  round(est, 6) AS est_jaccard,
         |  round(ex, 6) AS jaccard,
         |  round(abs(est - ex), 6) AS abs_err
         |FROM scored
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "d4_ngram_jaccard" ->
      s"""WITH $CandSql,
         |distinct_sh AS (
         |  SELECT doc_id, list_distinct(sh) AS dsh FROM shingled)
         |SELECT doc_a, doc_b,
         |  len(list_intersect(a.dsh, b.dsh))::DOUBLE /
         |    (len(a.dsh) + len(b.dsh) - len(list_intersect(a.dsh, b.dsh))) AS jaccard
         |FROM cand
         |JOIN distinct_sh a ON doc_a = a.doc_id
         |JOIN distinct_sh b ON doc_b = b.doc_id
         |WHERE len(list_intersect(a.dsh, b.dsh))::DOUBLE /
         |    (len(a.dsh) + len(b.dsh) - len(list_intersect(a.dsh, b.dsh))) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "d7_url_dedup" ->
      """WITH urled AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN doc_id % 4 = 0 THEN 'https://www.' || source || '.example.com/docs/' || (doc_id % 50)::VARCHAR
        |      WHEN doc_id % 4 = 1 THEN 'http://' || source || '.example.com/docs/' || (doc_id % 50)::VARCHAR || '/'
        |      WHEN doc_id % 4 = 2 THEN 'HTTPS://' || upper(source) || '.EXAMPLE.COM/docs/' || (doc_id % 50)::VARCHAR || '?utm_source=feed'
        |      ELSE 'https://' || source || '.example.com/docs/' || (doc_id % 50)::VARCHAR || '#frag'
        |    END AS url
        |  FROM documents)
        |SELECT
        |  regexp_replace(regexp_replace(regexp_replace(lower(url),
        |    '^https?://(www\.)?', ''), '[?#].*$', ''), '/$', '') AS url_norm,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM urled
        |GROUP BY 1
        |HAVING count(*) > 1
        |ORDER BY url_norm""".stripMargin,

    "d5_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    ('0x' || substring(md5(tok), 1, 4))::BIGINT AS h
         |  FROM (SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         |      ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
         |    FROM documents) t),
         |bits AS (
         |  SELECT doc_id,
         |    ${(0 until 16).map(i =>
              s"sum(CASE WHEN CAST(floor(h / ${1L << i}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS b$i")
              .mkString(",\n    ")}
         |  FROM toks GROUP BY doc_id)
         |SELECT doc_id,
         |  ${(0 until 16).map(i => s"(CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")} AS fingerprint
         |FROM bits
         |ORDER BY doc_id""".stripMargin,

    "d6_embedding_dup" ->
      """WITH base AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id,
        |    list_transform(embedding::DOUBLE[], x -> x * 1.5) AS emb
        |  FROM embeddings WHERE vec_id % 25 = 0),
        |bucketed AS (
        |  SELECT vec_id, emb,
        |    concat(CASE WHEN emb[1] >= 0 THEN '1' ELSE '0' END,
        |           CASE WHEN emb[2] >= 0 THEN '1' ELSE '0' END,
        |           CASE WHEN emb[3] >= 0 THEN '1' ELSE '0' END,
        |           CASE WHEN emb[4] >= 0 THEN '1' ELSE '0' END) AS bucket
        |  FROM base)
        |SELECT l.vec_id AS vec_a, r.vec_id AS vec_b,
        |  list_dot_product(l.emb, r.emb) /
        |    (sqrt(list_dot_product(l.emb, l.emb)) * sqrt(list_dot_product(r.emb, r.emb))) AS cosine
        |FROM bucketed l JOIN bucketed r
        |  ON l.bucket = r.bucket AND l.vec_id < r.vec_id
        |WHERE list_dot_product(l.emb, r.emb) /
        |    (sqrt(list_dot_product(l.emb, l.emb)) * sqrt(list_dot_product(r.emb, r.emb))) >= 0.95
        |ORDER BY vec_a, vec_b""".stripMargin,

    "d12_semantic_dedup" ->
      s"""WITH base AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 200000 AS vec_id,
         |    list_concat([embedding[1]::DOUBLE + 0.05],
         |      (embedding::DOUBLE[])[2:64]) AS emb
         |  FROM embeddings WHERE vec_id % 20 = 0),
         |c AS (
         |  SELECT vec_id AS cent_id, embedding::DOUBLE[] AS c_emb
         |  FROM embeddings WHERE vec_id % $SemCentStride = 0),
         |assigned AS (
         |  SELECT vec_id, emb, cell, c_cos FROM (
         |    SELECT base.vec_id, base.emb, c.cent_id AS cell,
         |      list_dot_product(base.emb, c.c_emb) /
         |        (sqrt(list_dot_product(base.emb, base.emb)) *
         |         sqrt(list_dot_product(c.c_emb, c.c_emb))) AS c_cos,
         |      row_number() OVER (PARTITION BY base.vec_id ORDER BY
         |        list_dot_product(base.emb, c.c_emb) /
         |          (sqrt(list_dot_product(base.emb, base.emb)) *
         |           sqrt(list_dot_product(c.c_emb, c.c_emb))) DESC,
         |        c.cent_id) AS crank
         |    FROM base, c) t WHERE crank = 1),
         |blocked AS (
         |  SELECT vec_id, emb, cell,
         |    CAST(floor((row_number() OVER (PARTITION BY cell
         |      ORDER BY c_cos DESC, vec_id) - 1) / $SemMaxCell) AS BIGINT) AS blk
         |  FROM assigned)
         |SELECT l.cell, l.vec_id AS keep_id, r.vec_id AS dup_id,
         |  round(list_dot_product(l.emb, r.emb) /
         |    (sqrt(list_dot_product(l.emb, l.emb)) *
         |     sqrt(list_dot_product(r.emb, r.emb))), 6) AS cosine
         |FROM blocked l JOIN blocked r
         |  ON l.cell = r.cell AND l.blk = r.blk AND l.vec_id < r.vec_id
         |WHERE list_dot_product(l.emb, r.emb) /
         |    (sqrt(list_dot_product(l.emb, l.emb)) *
         |     sqrt(list_dot_product(r.emb, r.emb))) >= $SemDupCos
         |ORDER BY keep_id, dup_id""".stripMargin,

    "d13_incremental_dedup" ->
      """WITH batch AS (
        |  SELECT doc_id + 500000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 520000 AS doc_id,
        |    text || ' fresh revision ' || doc_id::VARCHAR AS text
        |  FROM documents WHERE doc_id % 13 = 0
        |  UNION ALL
        |  SELECT doc_id + 600000 AS doc_id, text || ' batch special' AS text
        |  FROM documents WHERE doc_id % 31 = 0
        |  UNION ALL
        |  SELECT doc_id + 610000 AS doc_id, text || ' batch special' AS text
        |  FROM documents WHERE doc_id % 31 = 0),
        |corpus_h AS (
        |  SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h,
        |    row_number() OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        |                       ORDER BY doc_id) AS rn
        |  FROM batch)
        |SELECT b.doc_id,
        |  CASE WHEN c.h IS NOT NULL THEN 'dup_of_corpus'
        |       WHEN b.rn > 1 THEN 'dup_in_batch'
        |       ELSE 'ingested' END AS status
        |FROM hashed b LEFT JOIN corpus_h c ON b.h = c.h
        |ORDER BY b.doc_id""".stripMargin,

    "d14_cross_corpus_lsh" -> {
      def sigCtes(p: String, src: String) = {
        val bandUnion = (0 until Bands).map { b =>
          val parts = (0 until 4).map(r => s"s${b * 4 + r}::VARCHAR").mkString(" || '|' || ")
          s"SELECT doc_id, $b AS band_id, md5($parts) AS band_hash FROM ${p}sig"
        }.mkString("\n  UNION ALL\n  ")
        s"""${p}w AS (
           |  SELECT doc_id, CASE WHEN trim(text) = '' THEN []::VARCHAR[]
           |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
           |  FROM $src),
           |${p}sh AS (SELECT doc_id, $ShinglesSql AS sh FROM ${p}w),
           |${p}h AS (
           |  SELECT doc_id,
           |    ('0x' || substring(md5(s), 1, 8))::BIGINT AS h1,
           |    ('0x' || substring(md5(s), 9, 8))::BIGINT AS h2
           |  FROM (SELECT doc_id, unnest(sh) AS s FROM ${p}sh) t),
           |${p}sig AS (
           |  SELECT doc_id, ${(0 until K).map(i => s"${sigSql(i)} AS s$i").mkString(", ")}
           |  FROM ${p}h GROUP BY doc_id),
           |${p}bands AS (
           |  $bandUnion)""".stripMargin
      }
      s"""WITH batch_raw AS (
         |  SELECT doc_id + 700000 AS doc_id, text || ' extra tail words' AS text
         |  FROM documents WHERE doc_id % 15 = 0
         |  UNION ALL
         |  SELECT doc_id + 720000 AS doc_id,
         |    array_to_string(list_transform(generate_series(0, 29),
         |      i -> 'novel' || ((doc_id + 720000 + i * 37) % 99991)::VARCHAR), ' ') AS text
         |  FROM documents WHERE doc_id % 13 = 0),
         |${sigCtes("c", "documents")},
         |${sigCtes("b", "batch_raw")},
         |m AS (
         |  SELECT b.doc_id, count(DISTINCT c.doc_id) AS n_candidates
         |  FROM bbands b JOIN cbands c
         |    ON b.band_id = c.band_id AND b.band_hash = c.band_hash
         |  GROUP BY b.doc_id)
         |SELECT br.doc_id,
         |  CAST(coalesce(m.n_candidates, 0) AS BIGINT) AS n_candidates,
         |  coalesce(m.n_candidates, 0) > 0 AS matched
         |FROM batch_raw br LEFT JOIN m ON br.doc_id = m.doc_id
         |ORDER BY br.doc_id""".stripMargin
    },

    "d18_dup_curve" -> {
      val exactDupesSql =
        """SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0""".stripMargin
      s"""WITH corpus AS (
         |  $exactDupesSql),
         |docs AS (
         |  SELECT doc_id,
         |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
         |    ('0x' || substring(md5('lvl|' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS bucket
         |  FROM corpus),
         |lv AS (SELECT unnest([25, 50, 75, 100]) AS level),
         |per_hash AS (
         |  SELECT l.level, d.h, count(*) AS n
         |  FROM docs d JOIN lv l ON d.bucket < l.level
         |  GROUP BY l.level, d.h)
         |SELECT CAST(level AS BIGINT) AS level,
         |  CAST(sum(n) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT) AS n_dups,
         |  round(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END)::DOUBLE / sum(n), 6) AS dup_rate
         |FROM per_hash
         |GROUP BY level
         |ORDER BY level""".stripMargin
    },

    "d19_bloom_probe" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
        |  FROM documents),
        |base AS (SELECT doc_id, h FROM docs WHERE doc_id % 7 <> 3),
        |probes AS (
        |  SELECT doc_id, h FROM docs WHERE doc_id % 7 = 3
        |  UNION ALL
        |  SELECT doc_id + 900000 AS doc_id, h FROM base WHERE doc_id % 11 = 0),
        |bb AS (
        |  SELECT DISTINCT
        |    ('0x' || substring(md5('bloom' || t.i || '|' || b.h), 1, 15))::BIGINT
        |      % 1024 AS bit
        |  FROM base b, unnest(generate_series(0, 3)) AS t(i)),
        |bh AS (SELECT DISTINCT h FROM base),
        |stats AS (
        |  SELECT (SELECT count(*) FROM bb)::BIGINT AS n_bits_set,
        |    (SELECT count(*) FROM bh)::BIGINT AS n_base,
        |    (SELECT count(*) FROM probes)::BIGINT AS n_probes),
        |pb AS (
        |  SELECT p.doc_id, p.h,
        |    ('0x' || substring(md5('bloom' || t.i || '|' || p.h), 1, 15))::BIGINT
        |      % 1024 AS bit
        |  FROM probes p, unnest(generate_series(0, 3)) AS t(i)),
        |hits AS (
        |  SELECT pb.doc_id, pb.h,
        |    sum(CASE WHEN bb.bit IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits
        |  FROM pb LEFT JOIN bb ON pb.bit = bb.bit
        |  GROUP BY pb.doc_id, pb.h),
        |cls AS (
        |  SELECT hits.doc_id, hits.n_hits = 4 AS predicted_dup,
        |    bh.h IS NOT NULL AS actual_dup
        |  FROM hits LEFT JOIN bh ON hits.h = bh.h)
        |SELECT predicted_dup, actual_dup, count(*)::BIGINT AS n_docs,
        |  round(count(*)::DOUBLE / stats.n_probes, 6) AS share,
        |  stats.n_bits_set,
        |  round(stats.n_bits_set::DOUBLE / 1024, 6) AS fill_ratio,
        |  round(power(1.0 - power(1.0 - 1.0 / 1024, stats.n_base::DOUBLE * 4), 4),
        |    6) AS expected_fp_rate
        |FROM cls, stats
        |GROUP BY predicted_dup, actual_dup, stats.n_probes, stats.n_bits_set,
        |  stats.n_base
        |ORDER BY predicted_dup, actual_dup""".stripMargin,

    // Same four factorings of the sigs relation; volume = Σ C(n,2)
    // over band-bucket sizes (pair-generation incidences — no pair
    // enumeration, mirroring the Spark side's round-16 bounded form),
    // recall = truth pairs probed against the band table; truth = the
    // planted (orig, orig+offset) pairs with both signatures present.
    "d21_band_layout" -> {
      val layouts = Seq((16, 1), (8, 2), (4, 4), (2, 8))
      val bandsSql = layouts.flatMap { case (b, r) =>
        (0 until b).map { bi =>
          val parts = (0 until r).map(j => s"s${bi * r + j}::VARCHAR")
            .mkString(" || '|' || ")
          s"SELECT doc_id, '${b}x$r' AS layout, $bi AS band_id, md5($parts) AS band_hash FROM sigs"
        }
      }.mkString("\n  UNION ALL\n  ")
      val metaSql = layouts.map { case (b, r) =>
        s"SELECT '${b}x$r' AS layout, CAST($b AS BIGINT) AS n_bands, " +
          s"CAST($r AS BIGINT) AS rows_per_band, " +
          s"round(power(1.0/$b, 1.0/$r), 6) AS threshold"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH srcw AS (
         |  SELECT doc_id, text, CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS pw
         |  FROM documents),
         |corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, text || ' extra tail words'
         |  FROM documents WHERE doc_id % 20 = 0
         |  UNION ALL
         |  SELECT doc_id + 300000,
         |    array_to_string(pw ||
         |      list_transform(pw, x -> x || '_z' || doc_id::VARCHAR), ' ')
         |  FROM srcw WHERE doc_id % 20 = 10),
         |${sigsSql("SELECT doc_id, text FROM corpus")},
         |bands AS (
         |  $bandsSql),
         |t_high AS (
         |  SELECT a.doc_id AS doc_a, a.doc_id + 100000 AS doc_b
         |  FROM sigs a JOIN sigs b ON b.doc_id = a.doc_id + 100000
         |  WHERE a.doc_id % 20 = 0 AND a.doc_id < 100000),
         |t_mid AS (
         |  SELECT a.doc_id AS doc_a, a.doc_id + 300000 AS doc_b
         |  FROM sigs a JOIN sigs b ON b.doc_id = a.doc_id + 300000
         |  WHERE a.doc_id % 20 = 10 AND a.doc_id < 100000),
         |stats AS (
         |  SELECT (SELECT count(*) FROM t_high) AS n_high,
         |         (SELECT count(*) FROM t_mid) AS n_mid,
         |         (SELECT count(*) FROM sigs) AS n_docs),
         |volume AS (
         |  SELECT layout, CAST(sum(n * (n - 1) // 2) AS BIGINT) AS n_candidates
         |  FROM (SELECT layout, band_id, band_hash, count(*)::BIGINT AS n
         |        FROM bands GROUP BY 1, 2, 3)
         |  GROUP BY layout),
         |f_high AS (
         |  SELECT layout, count(*)::BIGINT AS f_high
         |  FROM (SELECT DISTINCT l.layout, t.doc_a, t.doc_b
         |        FROM t_high t
         |        JOIN bands l ON l.doc_id = t.doc_a
         |        JOIN bands r ON r.doc_id = t.doc_b AND r.layout = l.layout
         |          AND r.band_id = l.band_id AND r.band_hash = l.band_hash)
         |  GROUP BY layout),
         |f_mid AS (
         |  SELECT layout, count(*)::BIGINT AS f_mid
         |  FROM (SELECT DISTINCT l.layout, t.doc_a, t.doc_b
         |        FROM t_mid t
         |        JOIN bands l ON l.doc_id = t.doc_a
         |        JOIN bands r ON r.doc_id = t.doc_b AND r.layout = l.layout
         |          AND r.band_id = l.band_id AND r.band_hash = l.band_hash)
         |  GROUP BY layout),
         |meta AS (
         |  $metaSql)
         |SELECT m.layout, m.n_bands, m.rows_per_band, m.threshold,
         |  coalesce(v.n_candidates, 0) AS n_candidates,
         |  round(coalesce(v.n_candidates, 0)::DOUBLE / st.n_docs, 6) AS cand_per_doc,
         |  CAST(st.n_high AS BIGINT) AS n_high,
         |  round(coalesce(h.f_high, 0)::DOUBLE / st.n_high, 6) AS high_recall,
         |  CAST(st.n_mid AS BIGINT) AS n_mid,
         |  round(coalesce(md.f_mid, 0)::DOUBLE / st.n_mid, 6) AS mid_recall
         |FROM meta m
         |LEFT JOIN volume v USING (layout)
         |LEFT JOIN f_high h USING (layout)
         |LEFT JOIN f_mid md USING (layout)
         |CROSS JOIN stats st
         |ORDER BY m.n_bands DESC""".stripMargin
    },

    // Same stride-1 window digests, same interval merge (lag + running
    // sum over dup windows), same planted 30-word shared prefix with
    // the unique-vocabulary tail.
    "d20_span_dedup" ->
      s"""WITH src AS (
         |  SELECT doc_id, CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
         |  FROM documents),
         |corpus AS (
         |  SELECT doc_id, w FROM src
         |  UNION ALL
         |  SELECT doc_id + 500000,
         |    w[1:30] || list_transform(w[31:50], x -> x || '_' || doc_id::VARCHAR)
         |  FROM src WHERE doc_id % 6 = 0),
         |sized AS (SELECT doc_id, w, len(w)::BIGINT AS n_words FROM corpus),
         |wins AS (
         |  SELECT doc_id, n_words, i::BIGINT AS i,
         |    md5(array_to_string(w[i : i + ${SpanW - 1}], ' ')) AS h
         |  FROM sized,
         |    unnest(generate_series(1, CAST(n_words AS INT) - ${SpanW - 1})) AS t(i)
         |  WHERE n_words >= $SpanW),
         |duph AS (SELECT h FROM wins GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
         |dw AS (
         |  SELECT w.doc_id, w.n_words, w.i,
         |    CASE WHEN w.i - lag(w.i) OVER (PARTITION BY w.doc_id ORDER BY w.i)
         |      > $SpanW THEN 1 ELSE 0 END AS newspan
         |  FROM wins w JOIN duph USING (h)),
         |isl AS (
         |  SELECT doc_id, n_words, i,
         |    sum(newspan) OVER (PARTITION BY doc_id ORDER BY i) AS grp
         |  FROM dw),
         |spans AS (
         |  SELECT doc_id, n_words, grp, min(i) AS s, max(i) + ${SpanW - 1} AS e,
         |    count(*)::BIGINT AS nw
         |  FROM isl GROUP BY doc_id, n_words, grp)
         |SELECT doc_id, n_words,
         |  CAST(sum(nw) AS BIGINT) AS n_dup_windows,
         |  count(*)::BIGINT AS n_spans,
         |  CAST(max(e - s + 1) AS BIGINT) AS max_span_words,
         |  CAST(sum(e - s + 1) AS BIGINT) AS covered_words,
         |  round(sum(e - s + 1)::DOUBLE / n_words, 6) AS dup_frac,
         |  round(sum(e - s + 1)::DOUBLE / n_words, 6) <= 0.5 AS keep
         |FROM spans
         |GROUP BY doc_id, n_words
         |ORDER BY doc_id""".stripMargin,

    "d17_containment" ->
      s"""WITH basew AS (
         |  SELECT doc_id, CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         |    ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
         |  FROM documents),
         |corpus AS (
         |  SELECT doc_id, w FROM basew
         |  UNION ALL
         |  SELECT doc_id + 600000, w[1 : CAST(floor(len(w) * 0.4) AS INT)] AS w
         |  FROM basew WHERE doc_id % 9 = 0 AND len(w) >= 8),
         |shn AS (
         |  SELECT doc_id, dsh FROM (
         |    SELECT doc_id, list_distinct(list_transform(
         |      generate_series(1, greatest(len(w) - ${D17ShingleN - 1}, 0)),
         |      i -> array_to_string(w[i:i+${D17ShingleN - 1}], ' '))) AS dsh
         |    FROM corpus) t
         |  WHERE len(dsh) > 0),
         |raw_anchors AS (
         |  SELECT doc_id,
         |    unnest(list_sort(list_transform(dsh, x -> md5(x)))[1:$AnchorK]) AS anchor
         |  FROM shn),
         |cold AS (
         |  SELECT anchor FROM raw_anchors GROUP BY anchor
         |  HAVING count(*) <= $MaxAnchorDf),
         |anchors AS (
         |  SELECT a.doc_id, a.anchor FROM raw_anchors a JOIN cold c USING (anchor)),
         |cand AS (
         |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
         |  FROM anchors l JOIN anchors r
         |    ON l.anchor = r.anchor AND l.doc_id < r.doc_id),
         |j AS (
         |  SELECT doc_a, doc_b,
         |    len(a.dsh) AS n_sh_a, len(b.dsh) AS n_sh_b,
         |    round(len(list_intersect(a.dsh, b.dsh))::DOUBLE / len(a.dsh), 6) AS containment_a,
         |    round(len(list_intersect(a.dsh, b.dsh))::DOUBLE / len(b.dsh), 6) AS containment_b
         |  FROM cand JOIN shn a ON doc_a = a.doc_id JOIN shn b ON doc_b = b.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(n_sh_a AS BIGINT) AS n_sh_a, CAST(n_sh_b AS BIGINT) AS n_sh_b,
         |  containment_a, containment_b,
         |  CASE WHEN containment_a >= 0.9 AND containment_b >= 0.9 THEN 'mutual'
         |       WHEN containment_a >= 0.9 THEN 'a_in_b'
         |       ELSE 'b_in_a' END AS relation
         |FROM j
         |WHERE greatest(containment_a, containment_b) >= 0.9
         |ORDER BY doc_a, doc_b""".stripMargin
  )
}
