package graft

import org.apache.spark.sql.functions._

/** Properties of the round-6 curation/ops operators that the DuckDB
  * oracle equivalence can't express: planted-violator routing, plan
  * shape (no cartesian pair scan in d12), and conservation laws.
  */
class CurationSpec extends SparkSuite {

  test("planted-id offsets stay clear of the base id domain") {
    // Tests below classify planted rows by ABSOLUTE id offsets
    // (+100000, +200000, +300000, +500000, ...). If a data-generator
    // change ever grows the base id domain into those ranges, the
    // classifications would silently misbind planted vs real rows —
    // fail loudly here instead.
    val maxDoc = Tables.documents(spark, sf).agg(max(col("doc_id")))
      .collect().head.getLong(0)
    val maxVec = Tables.embeddings(spark, sf).agg(max(col("vec_id")))
      .collect().head.getLong(0)
    assert(maxDoc < 100000L, s"documents ids reach $maxDoc — planted offsets collide")
    assert(maxVec < 100000L, s"embeddings ids reach $maxVec — planted offsets collide")
  }

  test("t16 planted violators fail exactly their engineered rules") {
    val rows = SparkEntry.queries("t16_gopher_rules")(spark, sf).collect()
    val spam = rows.filter(r => r.getLong(0) >= 300000L && r.getLong(0) < 310000L)
    val tiny = rows.filter(_.getLong(0) >= 310000L)
    assert(spam.nonEmpty && tiny.nonEmpty)
    // symbol spam: word count fine, everything content-shaped fails
    spam.foreach { r =>
      assert(r.getAs[Boolean]("rule_nwords"))
      assert(!r.getAs[Boolean]("rule_wordlen"))
      assert(!r.getAs[Boolean]("rule_alpha"))
      assert(!r.getAs[Boolean]("keep"))
    }
    // 2-word stub: content rules fine, length fails
    tiny.foreach { r =>
      assert(!r.getAs[Boolean]("rule_nwords"))
      assert(r.getAs[Boolean]("rule_wordlen"))
      assert(r.getAs[Boolean]("rule_alpha"))
      assert(!r.getAs[Boolean]("keep"))
    }
    // the filter keeps a real corpus majority — not vacuously strict
    val real = rows.filter(_.getLong(0) < 300000L)
    assert(real.count(_.getAs[Boolean]("keep")) > real.length / 2)
  }

  test("t17 weights only downsample and hit the target share for heavy langs") {
    val rows = SparkEntry.queries("t17_mix_weights")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      assert(w > 0.0 && w <= 1.0, s"weight out of range: $r")
      assert(r.getAs[Long]("eff_tokens") <= r.getAs[Long]("tokens"))
    }
    // a downweighted language's effective share ends at its target
    val total = rows.map(_.getAs[Long]("tokens")).sum.toDouble
    rows.filter(_.getAs[Double]("weight") < 1.0).foreach { r =>
      val effShare = r.getAs[Long]("eff_tokens") / total
      assert(math.abs(effShare - r.getAs[Double]("target")) < 0.01,
        s"effective share misses target: $r")
    }
  }

  test("d12 stays cell-bucketed (no nested-loop pair scan) and finds planted dups") {
    val df = SparkEntry.queries("d12_semantic_dedup")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // The only nested-loop joins allowed are the two broadcast-centroid
    // ASSIGNMENT passes (corpus × k centroids — the intended IVF
    // shape, k ≪ corpus). The O(n²)-shaped PAIR join must be keyed on
    // the cell, i.e. hash-partitioned, never nested-loop.
    assert(plan.contains("hashpartitioning(cell"),
      "pair generation must join on the cell key, not scan all pairs")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 2,
      "a nested-loop join beyond the two centroid assignments means the pair scan went cartesian")
    val pairs = df.collect()
    assert(pairs.nonEmpty)
    // every pair involving a planted copy binds it to ITS original
    // (natural near-dup pairs among base vectors are allowed — their
    // absence is a property of the generator, not of the operator)
    pairs.filter(_.getAs[Long]("dup_id") >= 200000L).foreach { r =>
      assert(r.getAs[Long]("dup_id") === r.getAs[Long]("keep_id") + 200000L, s"$r")
      assert(r.getAs[Double]("cosine") >= 0.98)
    }
    // and the planted pairs overwhelmingly surface (a copy may sit in
    // a different cell/block than its original near a boundary)
    val planted = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 20 === 0).count()
    val found = pairs.count(r =>
      r.getAs[Long]("dup_id") === r.getAs[Long]("keep_id") + 200000L)
    assert(found >= (planted * 0.8).toLong, s"only $found of $planted planted pairs surfaced")
  }

  test("d12 hot cells are block-split: pair fanout stays linear, never quadratic") {
    import graft.queries.Dedup
    // Engineer ONE hot cell: 200 near-identical copies of a base
    // vector (tiny distinct nudges on dim 0) all land on the same
    // nearest centroid. With maxCell=16 the within-cell self-join must
    // run per block: ceil(200/16)=13 blocks -> 12*C(16,2)+C(8,2)=1468
    // candidate pairs, where the unbounded form would compare
    // C(200,2)=19900.
    val base = Tables.embeddings(spark, sf).filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>").as("emb"))
      .collect().head.getSeq[Double](0)
    val hot = spark.range(200).select(col("id").as("vec_id"),
      concat(array(lit(base.head) + col("id").cast("double") * lit(1e-7)),
        typedLit(base.tail.toSeq)).as("emb"))
      .withColumn("nrm", graft.functions.Vec.norm(col("emb")))
    val cents = Tables.embeddings(spark, sf)
      .filter(col("vec_id").between(1L, 5L))
      .select(col("vec_id").as("cent_id"),
        col("embedding").cast("array<double>").as("c_emb"))
      .withColumn("c_nrm", graft.functions.Vec.norm(col("c_emb")))
    // minCos = -1 disables the similarity filter so the row count IS
    // the candidate-pair count the join materialized
    val candidates = Dedup.semanticDedupPairs(hot, cents, -1.0, 16).collect()
    assert(candidates.length === 12 * 120 + 28,
      s"expected block-bounded 1468 candidate pairs, got ${candidates.length}")
    // near-identical copies still dedup within their blocks
    val dups = Dedup.semanticDedupPairs(hot, cents, 0.98, 16).count()
    assert(dups === candidates.length.toLong,
      "near-identical block members must all clear the dup threshold")
  }

  test("a10 cell shares sum to 1 and skew means 1 across cells") {
    val rows = SparkEntry.queries("a10_cell_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    val share = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(share - 1.0) < 1e-4, s"shares sum to $share")
    val skew = rows.map(_.getAs[Double]("skew")).sum / rows.length
    assert(math.abs(skew - 1.0) < 1e-4, s"mean skew $skew")
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables.embeddings(spark, sf).count())
  }

  test("m17 shard throughput conserves the event count") {
    val rows = SparkEntry.queries("m17_throughput_stats")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ===
      Tables.events(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("peak_minute") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("span_us") >= 0L)
    }
  }

  test("q37 merge audit conserves the base and only inserts add keys") {
    val rows = SparkEntry.queries("q37_merge_upsert")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = Tables.load(spark, sf, "orders").count()
    assert(rows("unchanged") + rows("update") + rows("delete") === base)
    assert(rows("insert") > 0 && rows("delete") > 0 && rows("update") > 0)
  }

  test("mm6 corrupted headers quarantine as unknown, never a modality") {
    val rows = SparkEntry.queries("mm6_magic_sniff")(spark, sf).collect()
    val byType = rows.map(r => r.getString(0) -> r.getAs[Long]("n_objects")).toMap
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") % 50 === 7).count()
    assert(byType.getOrElse("unknown", 0L) === planted)
    assert(byType.values.sum === Tables.documents(spark, sf).count())
  }

  test("d13 re-uploads route to the corpus, batch doubles to first arrival") {
    val rows = SparkEntry.queries("d13_incremental_dedup")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    // every corpus re-upload (+500000) is caught against the corpus
    rows.filter(_._1 < 520000L).values.foreach(s => assert(s == "dup_of_corpus"))
    // the intra-batch double: first copy ingests, second dedups in-batch
    val firsts = rows.filter(k => k._1 >= 600000L && k._1 < 610000L)
    val seconds = rows.filter(_._1 >= 610000L)
    assert(firsts.nonEmpty && firsts.size === seconds.size)
    firsts.values.foreach(s => assert(s == "ingested"))
    seconds.values.foreach(s => assert(s == "dup_in_batch"))
    // fresh revisions all ingest
    rows.filter(k => k._1 >= 520000L && k._1 < 600000L).values
      .foreach(s => assert(s == "ingested"))
  }

  test("t18 planted repeats collapse to zero entropy; real docs clear the floor") {
    val rows = SparkEntry.queries("t18_entropy")(spark, sf).collect()
    val planted = rows.filter(_.getLong(0) >= 320000L)
    assert(planted.nonEmpty)
    planted.foreach { r =>
      assert(r.getAs[Double]("entropy") === 0.0)
      assert(!r.getAs[Boolean]("keep"))
    }
    val real = rows.filter(_.getLong(0) < 320000L)
    assert(real.forall(_.getAs[Boolean]("keep")))
  }

  test("m24 retention recommendation is the binding shard's horizon, floored at 24h") {
    val rows = SparkEntry.queries("m24_retention_sizing")(spark, sf).collect()
    assert(rows.nonEmpty)
    val needed = rows.map(_.getLong(4))
    val stream = rows.map(_.getLong(5)).distinct
    assert(stream.length === 1, "stream recommendation must be one number")
    assert(stream.head === math.max(needed.max, 24L))
    // binding flags exactly the max shard(s), and every horizon is
    // at least the lag age alone (the ETA only adds)
    rows.foreach { r =>
      assert(r.getBoolean(6) === (r.getLong(4) === needed.max))
      assert(r.getDouble(3) >= r.getLong(1).toDouble / 1e6,
        s"shard ${r.getLong(0)} needed_sec below its own lag age")
    }
  }

  test("m24's watermark decision is tied to m19's lateness profile") {
    import graft.queries.Messaging
    val m24 = SparkEntry.queries("m24_retention_sizing")(spark, sf).collect()
    // the per-shard disorder column IS m19's profile, not a parallel
    // recomputation that could drift
    val m19 = SparkEntry.queries("m19_late_events")(spark, sf).collect()
      .map(r => r.getAs[Long]("shard_id") -> r.getAs[Long]("max_disorder_us")).toMap
    m24.foreach(r => assert(r.getAs[Long]("max_disorder_us") ===
      m19(r.getAs[Long]("shard_id"))))
    // one fleet-wide horizon, and it is the SMALLEST ladder rung whose
    // fleet late fraction clears the floor (recomputed here from the
    // shared disorder kernel the operator sizes from)
    val wms = m24.map(_.getAs[Long]("watermark_sec")).distinct
    assert(wms.length === 1, "watermark must be one fleet-wide number")
    val dis = Messaging.disorderOf(
        graft.operators.Envelope.messages(spark, sf))
      .select(col("disorder_us")).collect().map(_.getLong(0))
    val fracs = Messaging.WatermarkLadderSec.map(c =>
      c -> dis.count(_ > c * 1000000L).toDouble / dis.length)
    val expected = fracs.find(_._2 <= Messaging.LateFloor).map(_._1)
      .getOrElse(Messaging.WatermarkLadderSec.max)
    assert(wms.head === expected,
      s"chosen watermark ${wms.head}s vs ladder $fracs")
  }

  test("m18 replay ranges are gapless per shard") {
    val rows = SparkEntry.queries("m18_replay_window")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("to_seq") - r.getAs[Long]("from_seq") + 1L ===
        r.getAs[Long]("n_replayed"),
        s"seq gap inside the replay window: $r")
    }
  }

  test("a11 quantized index keeps most of the exact top-k") {
    val rows = SparkEntry.queries("a11_quantized_recall")(spark, sf).collect()
    assert(rows.nonEmpty)
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    // int8 reconstruction error is ~0.4% of the value range per dim;
    // top-3 neighbor sets should survive nearly intact
    assert(mean >= 0.6, s"quantized recall collapsed: $mean")
  }

  test("a12 PQ codebooks cover every vector in every subspace") {
    val rows = SparkEntry.queries("a12_pq_codes")(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") === n)
      assert(r.getAs[Long]("n_codes_used") >= 1L)
      assert(r.getAs[Double]("mse") >= 0.0)
    }
  }

  test("m19 lateness profile is horizon-consistent") {
    val rows = SparkEntry.queries("m19_late_events")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ===
      Tables.events(spark, sf).count())
    rows.foreach { r =>
      val late = r.getAs[Long]("n_late")
      // any shard with a late event must show disorder past the horizon
      if (late > 0) assert(r.getAs[Long]("max_disorder_us") > 300000000L)
      assert(r.getAs[Double]("late_frac") <= 1.0)
    }
  }

  test("d20 planted shared prefixes surface as maximal spans and only they are dropped") {
    val rows = SparkEntry.queries("d20_span_dedup")(spark, sf).collect()
    val planted = rows.filter(_.getLong(0) >= 500000L)
    assert(planted.nonEmpty)
    // every planted copy that is long enough to window (it appears in
    // the output at all) is dropped — its 30 shared words dominate
    // its ≤50-word length; its max span covers ≥ the shared prefix's
    // reach (up to 30 words, less for short sources)
    planted.foreach { r =>
      assert(!r.getAs[Boolean]("keep"), s"planted ${r.getLong(0)} kept")
      assert(r.getAs[Long]("max_span_words") >= 10L)
    }
    // span merging is real: spans are maximal, so a doc's covered
    // words never exceed its word count and dup windows fit inside
    // the covered region (each window lies in some span)
    rows.foreach { r =>
      assert(r.getAs[Long]("covered_words") <= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("n_dup_windows") <= r.getAs[Long]("covered_words"))
      assert(r.getAs[Long]("max_span_words") <= r.getAs[Long]("covered_words"))
    }
  }

  test("d21 band layouts trade candidates for mid-similarity recall monotonically") {
    val rows = SparkEntry.queries("d21_band_layout")(spark, sf).collect()
      .sortBy(-_.getLong(1))          // by n_bands desc: 16x1 first
    assert(rows.map(_.getString(0)).toSeq === Seq("16x1", "8x2", "4x4", "2x8"))
    // candidate volume and mid-class recall both fall as bands narrow
    val cands = rows.map(_.getLong(4))
    val mid = rows.map(_.getDouble(9))
    assert(cands.zip(cands.tail).forall { case (a, b) => a >= b },
      s"candidates not monotone: ${cands.toSeq}")
    assert(mid.zip(mid.tail).forall { case (a, b) => a >= b },
      s"mid recall not monotone: ${mid.toSeq}")
    // per layout, the higher-J class can never recall worse than the
    // mid class (band collision prob is monotone in J), and the
    // S-curve must actually spread: the widest layouts catch the high
    // class fully, the narrowest misses most of the mid class
    rows.foreach(r => assert(r.getDouble(7) >= r.getDouble(9), r.toString))
    assert(rows.take(2).forall(_.getDouble(7) === 1.0))
    assert(mid.head >= 0.9 && mid.last <= 0.2,
      s"mid-class spread collapsed: ${mid.toSeq}")
  }

  test("t26 span decontamination localizes the intrinsic eval excerpts") {
    val rows = SparkEntry.queries("t26_span_decontam")(spark, sf).collect()
    assert(rows.nonEmpty)
    // every eval-source doc (every 13th with enough words) reports
    // its own excerpt: covered region at least the excerpt's windows
    val selfIds = rows.filter(r => r.getLong(0) % 13 === 0).map(_.getLong(0))
    assert(selfIds.nonEmpty, "no self-contaminated eval-source docs surfaced")
    rows.filter(r => r.getLong(0) % 13 === 0).foreach { r =>
      assert(r.getLong(4) >= 10L, s"doc ${r.getLong(0)} covered ${r.getLong(4)}")
    }
    // spans are coherent: covered ≤ n_words, windows ≤ covered
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1))
      assert(r.getLong(2) <= r.getLong(4))
    }
  }

  test("d14 near-dup edits mostly match the corpus; novel docs mostly do not") {
    val rows = SparkEntry.queries("d14_cross_corpus_lsh")(spark, sf).collect()
    val (near, novel) = rows.partition(_.getLong(0) < 720000L)
    assert(near.nonEmpty && novel.nonEmpty)
    // an appended tail leaves ≥1 of 4 bands unchanged w.h.p. (~99%)
    val nearHit = near.count(_.getAs[Boolean]("matched")).toDouble / near.length
    assert(nearHit >= 0.8, s"near-dup recall $nearHit")
    // disjoint shingles should (deterministically) almost never band-collide
    val novelHit = novel.count(_.getAs[Boolean]("matched")).toDouble / novel.length
    assert(novelHit <= 0.2, s"novel false-positive rate $novelHit")
  }

  test("mm7 coverage partitions the union of both modality tables") {
    val rows = SparkEntry.queries("mm7_pair_coverage")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_objects")).toMap
    val caps = Tables.documents(spark, sf).filter(col("doc_id") % 3 =!= 2).count()
    val vecs = Tables.embeddings(spark, sf).filter(col("vec_id") % 5 =!= 3).count()
    assert(rows("paired") + rows("text_only") === caps)
    assert(rows("paired") + rows("vec_only") === vecs)
  }

  test("q39 SCD2 revenue partitions the full order total across versions") {
    val rows = SparkEntry.queries("q39_scd2_join")(spark, sf).collect()
    assert(rows.nonEmpty)
    val base = Tables.load(spark, sf, "orders")
    assert(rows.map(_.getAs[Long]("n_orders")).sum === base.count(),
      "every order must resolve to exactly one dimension version")
  }

  test("a13 augmented-cosine ranking returns each probe's true MIPS top-k") {
    val rows = SparkEntry.queries("a13_mips_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    // within each probe, inner products are non-increasing by rank
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(2)).map(_.getAs[Double]("inner_product"))
      byRank.zip(byRank.tail).foreach { case (a, b) => assert(a >= b) }
    }
  }

  test("p3 index stats are internally consistent") {
    val r = SparkEntry.queries("p3_index_build")(spark, sf).collect().head
    assert(r.getAs[Long]("n_indexed") <= r.getAs[Long]("n_raw"))
    // a posting is a (term, doc) pair: bounded by terms×docs and ≥ terms
    assert(r.getAs[Long]("n_postings") >= r.getAs[Long]("n_terms"))
    assert(r.getAs[Long]("total_tf") >= r.getAs[Long]("n_postings"))
    assert(r.getAs[Long]("max_df") <= r.getAs[Long]("n_indexed"))
  }

  test("m20's reshard plan is self-consistent and splitting the hottest shard works") {
    import graft.operators.Envelope
    val plan = SparkEntry.queries("m20_reshard_plan")(spark, sf).collect()
    assert(plan.length === 8)
    val total = plan.map(_.getAs[Long]("n_events")).sum
    val mean = total.toDouble / plan.length
    // shares partition the stream; actions agree with the thresholds
    assert(math.abs(plan.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    plan.foreach { r =>
      val n = r.getAs[Long]("n_events")
      val expected =
        if (n > mean * 1.15) "split"
        else if (n < mean * 0.85) "merge_candidate" else "keep"
      assert(r.getAs[String]("action") === expected, s"$r vs mean $mean")
      if (r.getAs[String]("action") == "split")
        assert(r.getAs[Long]("target_shards") >= 2L)
      else assert(r.getAs[Long]("target_shards") === 1L)
    }

    // act on the plan: re-key the HOTTEST shard across ceil(load/mean)
    // sub-shards and verify each lands back at ~fleet-mean load
    val hottest = plan.maxBy(_.getAs[Long]("n_events"))
    val target = math.max(2L, math.ceil(hottest.getAs[Long]("n_events") / mean).toLong)
    val subLoads = Envelope.messages(spark, sf)
      .withColumn("shard_id", Envelope.shardId(col("partition_key")))
      .filter(col("shard_id") === hottest.getLong(0))
      .withColumn("sub",
        pmod(graft.functions.Portable.hash60(col("event_id").cast("string")), lit(target)))
      .groupBy("sub").count().collect().map(_.getAs[Long]("count"))
    assert(subLoads.length === target.toInt)
    assert(subLoads.max <= (mean * 1.3).toLong,
      s"split sub-shard still hot: ${subLoads.toSeq} vs fleet mean $mean")
  }

  test("p4 ingest manifest partitions the batch and the quality gate strictly bites") {
    val r = SparkEntry.queries("p4_daily_ingest")(spark, sf).collect().head
    // every batch doc gets exactly one disposition
    assert(r.getAs[Long]("n_dup_corpus") + r.getAs[Long]("n_dup_batch") +
      r.getAs[Long]("n_ingested") === r.getAs[Long]("n_received"))
    // every disposition is exercised by the engineered batch
    assert(r.getAs[Long]("n_dup_corpus") > 0)
    assert(r.getAs[Long]("n_dup_batch") > 0)
    assert(r.getAs[Long]("n_ingested") > 0)
    // the spam plants guarantee the quality gate strictly drops rows,
    // and curated docs carry a positive token budget
    assert(r.getAs[Long]("n_curated") > 0)
    assert(r.getAs[Long]("n_curated") < r.getAs[Long]("n_ingested"))
    assert(r.getAs[Long]("curated_tokens") > 0)
  }

  test("q38 zero-fills gaps and LOCF carries only observed values") {
    val rows = SparkEntry.queries("q38_gap_fill")(spark, sf).collect()
    assert(rows.nonEmpty)
    // months are consecutive: row count = span between first and last
    val months = rows.map(_.getString(0)).toSeq
    assert(months == months.sorted)
    var lastSeen: Option[Double] = None
    rows.foreach { r =>
      val avg = Option(r.getAs[java.lang.Double]("avg_price")).map(_.toDouble)
      val locf = Option(r.getAs[java.lang.Double]("locf_avg_price")).map(_.toDouble)
      if (avg.isDefined) lastSeen = avg
      assert(locf === lastSeen, s"LOCF invented or lost a value at $r")
      if (r.getAs[Long]("n_orders") === 0L) assert(avg.isEmpty)
    }
  }

  test("q43 sessions partition each user's events at exactly the 30-min gap") {
    val rows = SparkEntry.queries("q43_sessionize")(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    // conservation: every event lands in exactly one session
    assert(rows.map(_.getAs[Long]("n_events")).sum === total)
    // per-user session indexes are contiguous 1..n (the running-sum
    // numbering skipped or repeated an index otherwise)
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val idx = rs.map(_.getAs[Long]("session_idx")).sorted
      assert(idx.toSeq === (1L to idx.length).toSeq, s"user $u indexes: ${idx.toSeq}")
    }
    // multi-event sessions exist AND multi-session users exist — the
    // gap threshold actually cuts somewhere on this corpus
    assert(rows.exists(_.getAs[Long]("n_events") > 1))
    assert(rows.groupBy(_.getLong(0)).exists(_._2.length > 1))
    // a session never spans more than its events could: duration of a
    // 1-event session is 0
    rows.filter(_.getAs[Long]("n_events") === 1L)
      .foreach(r => assert(r.getAs[Long]("duration_us") === 0L))
  }

  test("m21 drain ETA is the lag/rate quotient and zero only when caught up") {
    val rows = SparkEntry.queries("m21_drain_eta")(spark, sf).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag_msgs")
      val rate = r.getAs[Double]("rate_per_sec")
      val eta = r.getAs[Double]("eta_sec")
      assert(lag >= 0L && rate > 0.0)
      if (lag == 0L) assert(eta === 0.0)
      // eta is computed from the UNROUNDED rate; the reported rate is
      // rounded to 6 dp, so allow that rounding's relative slack
      else assert(math.abs(eta * rate - lag) <= lag * 0.25 + 1.0,
        s"shard ${r.getLong(0)}: eta $eta × rate $rate ≉ lag $lag")
    }
  }

  test("t21 planted copies and boilerplate carriers are flagged; clean docs keep") {
    val rows = SparkEntry.queries("t21_segment_dedup")(spark, sf).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    val copies = rows.filter(_.getLong(0) >= 330000L)
    assert(copies.nonEmpty)
    // an exact re-upload shares EVERY segment with its original:
    // dup_ratio 1.0, dropped — and so is the original it copies
    copies.foreach { r =>
      assert(r.getAs[Double]("dup_ratio") === 1.0 && !r.getAs[Boolean]("keep"))
      val orig = byId(r.getLong(0) - 330000L)
      assert(orig.getAs[Double]("dup_ratio") === 1.0)
    }
    // every boilerplate carrier shows >= 2 dup segments (the planted
    // prefix is exactly two aligned segments shared by ~n/5 docs)
    val carriers = rows.filter(r => r.getLong(0) < 330000L && r.getLong(0) % 5 == 0)
    assert(carriers.nonEmpty)
    carriers.foreach(r => assert(r.getAs[Long]("n_dup_segs") >= 2L))
    // unplanted docs are mostly untouched — the synthetic corpus does
    // contain NATURAL exact dups and shared 10-word runs (its
    // generator draws from a small vocabulary), and the operator is
    // right to flag those too, so this is a large-majority bound,
    // not an equality
    val clean = rows.filter(r => r.getLong(0) < 330000L &&
      r.getLong(0) % 5 != 0 && r.getLong(0) % 10 != 0 && !byId.contains(r.getLong(0) + 330000L))
    assert(clean.count(r => r.getAs[Double]("dup_ratio") === 0.0) > clean.length / 2)
    assert(clean.count(r => r.getAs[Boolean]("keep")) >= (clean.length * 85) / 100)
  }

  test("t29 mines each source's planted banner as a template, at its exact df share") {
    val t29 = SparkEntry.queries("t29_boilerplate")(spark, sf).collect()
    // expected per-source banner df/n from the documents table itself
    val exp = Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(countDistinct(when(col("doc_id") % 3 =!= 2, col("doc_id"))).as("df"),
        countDistinct(col("doc_id")).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    exp.foreach { case (src, (df, n)) =>
      if (df.toDouble / n >= 0.3) {
        // the banner is exactly one aligned segment; its digest is
        // closed-form and its df is exactly the planted carrier count
        val hex = md5hex(
          s"official notice from $src all content rights reserved worldwide daily")
        val row = t29.find(r => r.getString(0) == src && r.getString(1) == hex)
        assert(row.isDefined, s"banner template missing for source $src")
        assert(row.get.getLong(2) === df && row.get.getLong(3) === n)
      }
    }
    // every emitted row clears the share bar; singleton segments
    // (df share ~1/n) never appear at corpus source sizes
    t29.foreach(r => assert(r.getLong(2).toDouble / r.getLong(3) >= 0.3))
    // DSL facade: the same mining over a tiny hand corpus, threshold
    // parameterized — the shared banner qualifies at 0.5, singleton
    // segments (1/3 = 0.33) do not
    import spark.implicits._
    import graft.dsl._
    val banner = "one two three four five six seven eight nine ten"
    val tiny = Seq(
      (1L, banner + " unique alpha tail", "s1"),
      (2L, banner + " unique beta tail", "s1"),
      (3L, "nothing shared in this one at all today friends", "s1"))
      .toDF("doc_id", "text", "source")
    val out = tiny.boilerplateTemplates(minShare = 0.5).collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === md5hex(banner) &&
      out.head.getLong(2) === 2L && out.head.getLong(3) === 3L)
  }

  test("t32 strips exactly the planted banners; surviving prose is byte-identical") {
    val t32 = SparkEntry.queries("t32_template_strip")(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        concat_ws(" ", graft.functions.Portable.words(col("text"))).as("norm"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty && t32.size === docs.length)
    var exactCarriers = 0
    docs.foreach { case (id, norm) =>
      val row = t32(id)
      val nTpl = row.getLong(2)
      if (id % 3 != 2) {
        // banner carrier: the 10-word banner is one aligned segment
        // and its df share (2/3) always clears the bar, so at least
        // it strips — natural per-source repeats may strip more
        assert(nTpl >= 1L, s"doc $id kept its banner")
        assert(row.getLong(4) >= 10L) // n_words_stripped
        if (nTpl == 1L && norm.nonEmpty) {
          // ONLY the banner stripped: the surviving prose must be the
          // original text byte-for-byte (normalized word join)
          assert(row.getString(5) === md5hex(norm), s"doc $id prose changed")
          exactCarriers += 1
        }
      } else if (nTpl == 0L && norm.nonEmpty) {
        // no template hit: the doc passes through untouched
        assert(row.getString(5) === md5hex(norm))
        assert(row.getLong(4) === 0L)
      }
    }
    // the byte-for-byte branch must actually exercise (most carriers
    // strip exactly the banner at corpus source sizes)
    assert(exactCarriers > docs.count(_._1 % 3 != 2) / 2)
  }

  test("d17 bottom-k anchors recall the planted truncations as pure containment") {
    val rows = SparkEntry.queries("d17_containment")(spark, sf).collect()
    // planted: every 9th doc with >= 8 words re-uploaded as its first
    // 40% of words — a shingle SUBSET, so containment_b is exactly 1.
    // The recall denominator needs the truncation to carry at least
    // one 5-word shingle: floor(0.4·len) >= 5 ⟺ len >= 13
    val planted = Tables.documents(spark, sf)
      .select(col("doc_id"), size(graft.functions.Portable.words(col("text"))).as("nw"))
      .filter(col("doc_id") % 9 === 0 && col("nw") >= 13)
      .collect().map(_.getLong(0)).toSet
    val found = rows.filter(r => planted.contains(r.getLong(0)) &&
      r.getLong(1) === r.getLong(0) + 600000L)
    // miss probability per pair is (1−c)^k ≈ 0.6^8 ≈ 1.7% — demand
    // the blocking recalls ≥ 90% of the planted subset pairs
    assert(found.length >= (planted.size * 9) / 10,
      s"${found.length} of ${planted.size} planted truncations recovered")
    found.foreach { r =>
      assert(r.getAs[Double]("containment_b") === 1.0)
      assert(Set("b_in_a", "mutual").contains(r.getAs[String]("relation")))
    }
    // nothing below the containment gate leaks into the report
    rows.foreach(r => assert(
      math.max(r.getAs[Double]("containment_a"), r.getAs[Double]("containment_b")) >= 0.9))
  }

  test("m22 flags the planted hot key's shard and dispositions stay internally consistent") {
    val rows = SparkEntry.queries("m22_hot_key_audit")(spark, sf).collect()
    assert(rows.length === 8)
    // disposition is a pure function of the reported share — the
    // column a reader acts on cannot disagree with the number
    rows.foreach { r =>
      val expect = if (r.getAs[Double]("top_key_share") > 0.5) "hot_key" else "split_effective"
      assert(r.getAs[String]("disposition") === expect)
      assert(r.getAs[Long]("top_key_n") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_keys") >= 1L)
    }
    // the planted 20× burst makes its shard the unambiguous worst
    // case: the max-top-key shard must be hot with a dominant share
    // (at tiny SFs OTHER shards may hold one key and be legitimately
    // hot too — a one-key shard truly cannot be split — so the pin is
    // on the burst shard, not on a global count)
    val worst = rows.maxBy(_.getAs[Long]("top_key_n"))
    val burstN = Tables.events(spark, sf)
      .filter(col("user_id") === Tables.events(spark, sf)
        .agg(min(col("user_id"))).collect().head.getLong(0)).count()
    assert(worst.getAs[Long]("top_key_n") === 21L * burstN)
    assert(worst.getAs[String]("disposition") === "hot_key")
    assert(worst.getAs[Double]("top_key_share") > 0.5)
    // the audit conserves the stream: events = base + 20× burst
    val base = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === base + 20L * burstN)
  }

  test("d18's yield curve grows with corpus level and closes on the exact full accounting") {
    import graft.functions.Portable
    val rows = SparkEntry.queries("d18_dup_curve")(spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(25L, 50L, 75L, 100L))
    // nested subsets: docs and dup rate must both be non-decreasing,
    // and the full-corpus rate strictly dominates the 25% sample's —
    // the sample-understates-dedup effect this table exists to price
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_docs") < b.getAs[Long]("n_docs"))
      assert(a.getAs[Double]("dup_rate") <= b.getAs[Double]("dup_rate") + 1e-9)
    }
    assert(rows.last.getAs[Double]("dup_rate") >= rows.head.getAs[Double]("dup_rate") * 1.5)
    // level 100 IS the exact full accounting: docs = corpus incl.
    // plants, dups = docs − distinct normalized digests
    val docs = Tables.documents(spark, sf)
    val corpus = docs.unionAll(docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L))
    val n = corpus.count()
    val distinctH = corpus
      .select(Portable.md5hex(Portable.normText(col("text"))).as("h"))
      .distinct().count()
    assert(rows.last.getAs[Long]("n_docs") === n)
    assert(rows.last.getAs[Long]("n_dups") === n - distinctH)
  }

  test("t22 count-min estimates are sound (never undercount) and tight on heavy hitters") {
    val rows = SparkEntry.queries("t22_heavy_hitters")(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      // the CMS theorem: collisions only ADD — an estimate below the
      // exact count means the sketch or the hash is broken
      assert(r.getAs[Boolean]("sound"))
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"))
      // 4×512 counters over this corpus keep heavy-hitter error small
      assert(r.getAs[Double]("overcount_frac") <= 0.25,
        s"token ${r.getString(0)} overcounts by ${r.getAs[Double]("overcount_frac")}")
    }
  }

  test("mm9 shard packing conserves bytes and sizes shard counts to the target") {
    val rows = SparkEntry.queries("mm9_shard_pack")(spark, sf).collect()
    val target = 4096.0
    val blobs = Tables.documents(spark, sf)
      .select(
        element_at(array(lit("audio"), lit("image"), lit("text"), lit("video")),
          (pmod(col("doc_id"), lit(4L)) + 1L).cast("int")).as("modality"),
        length(col("text").cast("binary")).cast("long").as("n_bytes"))
      .groupBy(col("modality")).agg(sum(col("n_bytes")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_.getString(0)).foreach { case (m, shards) =>
      val (total, nBlobs) = blobs(m)
      // conservation: every blob lands in exactly one shard
      assert(shards.map(_.getAs[Long]("shard_bytes")).sum === total)
      assert(shards.map(_.getAs[Long]("n_blobs")).sum === nBlobs)
      // the manifest's shard ids live inside the sized shard count
      val nShards = math.max(1L, math.ceil(total / target).toLong)
      assert(shards.map(_.getAs[Long]("shard_id")).forall(id => id >= 0 && id < nShards))
      // hash placement keeps the AGGREGATE on target even when single
      // shards wobble (n^-1/2): mean fill = total / (nShards·target)
      val meanFill = shards.map(_.getAs[Double]("fill")).sum / shards.length
      assert(meanFill >= 0.5 && meanFill <= 1.5, s"$m mean fill $meanFill")
    }
  }

  test("q44 funnel stages are monotone and start from the exact signup population") {
    val r = SparkEntry.queries("q44_event_funnel")(spark, sf).collect().head
    val nSignup = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(r.getAs[Long]("n_signup") === nSignup)
    assert(r.getAs[Long]("n_view_1h") <= r.getAs[Long]("n_signup"))
    assert(r.getAs[Long]("n_purchase_1h") <= r.getAs[Long]("n_view_1h"))
    // the strict 1-hour windows actually discriminate on this corpus
    assert(r.getAs[Long]("n_view_1h") < r.getAs[Long]("n_signup"))
  }

  test("p5 executes t17's plan: weight-1 strata intact, downsampled strata on-weight") {
    val rows = SparkEntry.queries("p5_mix_build")(spark, sf).collect()
    assert(math.abs(rows.map(_.getAs[Double]("realized_share")).sum - 1.0) <= 1e-4)
    rows.foreach { r =>
      val (nd, sel) = (r.getAs[Long]("n_docs"), r.getAs[Long]("sel_docs"))
      val (toks, selToks) = (r.getAs[Long]("tokens"), r.getAs[Long]("sel_tokens"))
      val w = r.getAs[Double]("weight")
      if (w >= 0.999999) {
        // under-represented stratum: the hash gate passes everything
        assert(sel === nd && selToks === toks)
      } else {
        // downsampled stratum: the deterministic hash gate realizes
        // the planned weight within hash-measure noise (~n^-1/2)
        assert(math.abs(selToks.toDouble - w * toks) <= 0.08 * toks,
          s"${r.getString(0)}: kept $selToks of $toks at weight $w")
        // and the realized share cannot undershoot the target (the
        // denominator shrinks, never grows)
        assert(r.getAs[Double]("realized_share") >= r.getAs[Double]("target") - 0.02)
      }
    }
  }

  test("d19's bloom merges associatively across ingest slices and never false-negatives") {
    import graft.queries.Dedup
    import graft.functions.Portable
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      Portable.md5hex(Portable.normText(col("text"))).as("h"))
    val base = docs.filter(col("doc_id") % 7 =!= 3)

    // mergeability — the property that lets one filter per ingest
    // worker union into the fleet filter: three disjoint slices'
    // blooms, unioned, equal the one-pass bloom bit-for-bit
    val slices = Seq(
      base.filter(col("doc_id") % 3 === 0),
      base.filter(col("doc_id") % 3 === 1),
      base.filter(col("doc_id") % 3 === 2))
    val merged = slices.map(Dedup.bloomOf)
      .reduce(_ unionByName _).distinct()
    val onePass = Dedup.bloomOf(base)
    assert(merged.exceptAll(onePass).isEmpty && onePass.exceptAll(merged).isEmpty)

    // zero false negatives — every base doc re-probed against the
    // grown filter must predict dup (the bloom guarantee; the d19
    // table exhibits it as the absent predicted=false/actual=true row)
    val reprobe = Dedup.bloomProbe(base, merged)
    assert(reprobe.filter(!col("predicted_dup")).count() === 0)

    // and a doc ingested in slice 0 re-uploaded after slice 2 merged
    // in is flagged by the incremental store, the d13-style cross-
    // batch contract
    val reup = base.filter(col("doc_id") % 3 === 0).limit(5)
      .withColumn("doc_id", col("doc_id") + 900000L)
    assert(Dedup.bloomProbe(reup, merged).filter(!col("predicted_dup")).count() === 0)
  }

  test("t27 provenance surfaces exactly the planted leaks, attributed to their source eval docs") {
    import graft.functions.Portable
    val rows = SparkEntry.queries("t27_contam_provenance")(spark, sf).collect()
    // no self-pairs ever (eval passages are corpus excerpts)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    val planted = rows.filter(_.getLong(0) >= 800000L)
    assert(planted.nonEmpty)
    // every qualifying plant source (an eval doc with a >= 10-word
    // excerpt, i.e. >= 14 words) yields its (plant, source) pair
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 39 === 0 &&
        size(Portable.words(col("text"))) >= 14)
      .count()
    val exactPairs = planted.filter(r => r.getLong(0) - 800000L == r.getLong(1))
    assert(exactPairs.length.toLong === expected,
      s"${exactPairs.length} plant pairs vs $expected qualifying sources")
    exactPairs.foreach { r =>
      // a full 21-word excerpt shares exactly 12 stride-1 windows,
      // starting after the 4 collision-proof pad words; shorter
      // excerpts share fewer — never more (pad/tail windows must not
      // match)
      assert(r.getAs[Long]("n_shared_windows") <= 12L, r.toString)
      assert(r.getAs[Long]("first_i") === 5L, r.toString)
    }
    assert(exactPairs.exists(_.getAs[Long]("n_shared_windows") == 12L))
  }

  test("p9 release gate is the conjunction of its own check rows over p8 card values") {
    val rows = SparkEntry.queries("p9_release_gate")(spark, sf).collect()
    assert(rows.length === 5)
    val rel = rows.map(_.getAs[Boolean]("release")).distinct
    assert(rel.length === 1, "release must be one fleet-wide verdict")
    assert(rel.head === rows.forall(_.getAs[Boolean]("pass")))
    // each check's value IS the card's own number, not a recomputation
    val card = SparkEntry.queries("p8_corpus_card")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
      .toMap
    val byName = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byName("dup_rate_max") === card(("dedup", "exact", "dup_rate")))
    assert(byName("contam_rate_max") === card(("decontam", "eval", "contam_doc_rate")))
    assert(byName("mean_quality_min") === card(("quality", "all", "mean")))
    assert(byName("index_recall_min") === card(("index", "ivfpq", "recall")))
  }

  test("a28 serve-cost table matches the a18 serve's actual candidate volume") {
    val rows = SparkEntry.queries("a28_serve_cost")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cells_routed") >= 1L)
      assert(r.getAs[Long]("adc_ops") === r.getAs[Long]("n_candidates") * 8L)
      val frac = r.getAs[Double]("frac_scanned")
      assert(frac >= 0.0 && frac < 1.0, s"IVF must scan a strict corpus subset: $r")
    }
    // the accounting is the serve's own candidacy: per probe, the
    // candidate count equals what a18's serve join actually scores
    import graft.queries.Similarity
    val served = Similarity.serveCost(spark, sf).collect()
      .map(r => r.getAs[Long]("probe_id") -> r.getAs[Long]("n_candidates")).toMap
    assert(served === rows.map(r =>
      r.getAs[Long]("probe_id") -> r.getAs[Long]("n_candidates")).toMap)
  }

  test("t28 calibration deciles conserve the corpus and order by the cheap score") {
    val rows = SparkEntry.queries("t28_quality_calibration")(spark, sf).collect()
    assert(rows.length <= 10 && rows.length >= 5)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).count())
    val mq = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Double]("mean_quality"))
    mq.zip(mq.tail).foreach { case (a, b) =>
      assert(b >= a, s"decile mean_quality not monotone: ${mq.toSeq}")
    }
    rows.foreach(r => assert(!r.getAs[Double]("mean_logp").isNaN))
  }

  test("p10 snapshot diff claims exactly the planted mutation classes") {
    val byStatus = SparkEntry.queries("p10_snapshot_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("delta_chars")))
      .toMap
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val removed = docs.filter(col("doc_id") % 23 === 5).count()
    val changed = docs.filter(col("doc_id") % 17 === 3 && col("doc_id") % 23 =!= 5).count()
    val added = docs.filter(col("doc_id") % 29 === 0).count()
    assert(byStatus("removed")._1 === removed)
    assert(byStatus("changed")._1 === changed)
    assert(byStatus("added")._1 === added)
    assert(byStatus("unchanged")._1 === n - removed - changed)
    // budget deltas point the right way
    assert(byStatus("added")._2 > 0L)
    assert(byStatus("removed")._2 < 0L)
    assert(byStatus("changed")._2 === changed * " revision two".length)
    assert(byStatus("unchanged")._2 === 0L)
  }

  test("a29 embed audit catches exactly the planted NaN/zero/duplicate vectors") {
    val r = SparkEntry.queries("a29_embed_audit")(spark, sf).collect().head
    val n = Tables.embeddings(spark, sf).count()
    assert(r.getAs[Long]("n_vecs") === n + 3)
    assert(r.getAs[Boolean]("dim_consistent") && r.getAs[Long]("n_dims") === 1L)
    assert(r.getAs[Long]("n_nan_vecs") === 1L)
    assert(r.getAs[Long]("n_zero_vecs") === 1L)
    // the planted exact copy is the only duplicate (the corpus is a
    // random draw; a natural collision would be a generator defect)
    assert(r.getAs[Long]("n_dup_vecs") === 1L)
    // the zero vector IS the norm floor; the healthy distribution sits
    // strictly above it
    assert(r.getAs[Double]("norm_min") === 0.0)
    assert(r.getAs[Double]("norm_p50") > 0.0)
    assert(r.getAs[Double]("norm_p99") <= r.getAs[Double]("norm_max"))
  }
}
