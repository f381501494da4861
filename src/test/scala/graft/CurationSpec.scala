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
}
