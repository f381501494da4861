package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Envelope

/** Messaging core (SURVEY.md §2.A) — the reference's pub/sub
  * semantics re-expressed as set operations over the events table.
  * Streaming-only behaviors (live checkpointing, ack/nack state) are
  * covered by graft.streaming + ScalaTest; everything here is the
  * batch-verifiable contract.
  */
object Messaging extends QueryPack {

  /** Shared oracle prelude: events with ns→µs-truncated ts, matching
    * graft.Tables.events. */
  private val Ev =
    "SELECT event_id, user_id, event_type, value, props, ts::TIMESTAMP AS ts FROM events"

  /** DuckDB mirror of Portable.hash60 / Envelope.shardId. */
  private def shardSql(expr: String) =
    s"('0x' || substring(md5($expr), 1, 15))::BIGINT % 8"

  private val Rfc3339 = "%Y-%m-%dT%H:%M:%SZ"

  /** m19: watermark lateness horizon (5 min, in µs). */
  private val WatermarkUs = 300000000L

  /** m24's watermark decision inputs: the candidate horizon ladder
    * (seconds) and the tolerable fleet-wide late-drop fraction. */
  private[graft] val WatermarkLadderSec = Seq(60L, 120L, 300L, 600L)
  private[graft] val LateFloor = 0.01

  /** m19/m24's shared per-event disorder kernel: each event's arrival
    * is its event time plus a deterministic md5-derived network delay
    * (0-600 s); per shard the high-water mark runs over ARRIVAL
    * order, and disorder_us is how far behind it the event lands —
    * exactly what a `withWatermark` horizon would measure against.
    * One window shuffle on shard_id; m19 rolls it up at the fixed
    * 5-min horizon, m24 sizes the horizon from the same cells. */
  private[graft] def disorderOf(msgs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = msgs
      .select(col("event_id"), col("ts"),
        Envelope.shardId(col("partition_key")).as("shard_id"))
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .withColumn("arr_us", col("ts_us") +
        pmod(graft.functions.Portable.hash60(col("event_id").cast("string")),
          lit(600L)) * lit(1000000L))
    val w = Window.partitionBy(col("shard_id"))
      .orderBy(col("arr_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("hwm_us", max(col("ts_us")).over(w))
      .withColumn("disorder_us",
        greatest(lit(0L), coalesce(col("hwm_us") - col("ts_us"), lit(0L))))
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // marshaller.go:44-70 JSONMarshaller: message → JSON envelope.
    "m1_marshal" -> { (s, d) =>
      val msgs = Envelope.messages(s, d)
      msgs.select(col("event_id"), Envelope.marshalled(msgs).as("envelope"))
        .orderBy(col("event_id"))
    },

    // marshaller.go:26-52 JSONUnmarshaller: envelope → message with
    // injected metadata (partitionKey, approximateArrivalTimestamp)
    // and EVERY wire header copied back out (marshaller.go:35-38).
    // Round-trips m1's envelope through the native parse kernel; the
    // oracle is the identity reconstruction, so any lossiness fails.
    "m2_unmarshal" -> { (s, d) =>
      val msgs = Envelope.messages(s, d)
      msgs.select(col("event_id"), col("partition_key"), col("ts"),
          Envelope.parsed(Envelope.marshalled(msgs)).as("env"))
        .select(
          col("event_id"),
          col("env.uuid").as("uuid"),
          col("partition_key"),
          col("env.payload").cast("string").as("payload_str"),
          Envelope.header(col("env"), "eventType").as("header_event_type"),
          Envelope.header(col("env"), "source").as("header_source"),
          size(col("env.headers")).cast("long").as("n_headers"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("arrival"))
        .orderBy(col("event_id"))
    },

    // Kinesis MD5 partition-key → shard routing (publisher.go:80).
    "m3_shard_assign" -> { (s, d) =>
      Envelope.messages(s, d)
        .select(col("event_id"), col("partition_key"),
          Envelope.shardId(col("partition_key")).as("shard_id"))
        .orderBy(col("event_id"))
    },

    // publisher.go:62-66: PutRecords batches capped at 500 records.
    // Batch formation = per-shard sequence div 500.
    "m4_publish_batches" -> { (s, d) =>
      Envelope.withShardSeq(Envelope.messages(s, d))
        .withColumn("batch_id", ((col("seq") - 1L) / 500L).cast("long"))
        .groupBy(col("shard_id"), col("batch_id"))
        .agg(count(lit(1)).as("n_records"),
          min(col("seq")).as("min_seq"), max(col("seq")).as("max_seq"))
        .orderBy(col("shard_id"), col("batch_id"))
    },

    // subscriber.go:50-66: ordered per-shard delivery — monotone
    // sequence numbers per shard in arrival order.
    "m5_per_shard_order" -> { (s, d) =>
      Envelope.withShardSeq(Envelope.messages(s, d))
        .select(col("event_id"), col("shard_id"), col("seq"))
        .orderBy(col("shard_id"), col("seq"))
    },

    // subscriber.go:66-73 Checkpointer.Checkpoint(seq): resume =
    // deliver only messages past each shard's last checkpoint (here:
    // the highest seq seen before the cutover instant).
    "m6_checkpoint_resume" -> { (s, d) =>
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      val seqd = Envelope.withShardSeq(Envelope.messages(s, d))
      val ckpt = seqd.groupBy(col("shard_id").as("c_shard"))
        .agg(max(when(col("ts") < cut, col("seq"))).as("ckpt_seq"))
      seqd.join(ckpt, col("shard_id") === col("c_shard"), "left")
        .filter(col("seq") > coalesce(col("ckpt_seq"), lit(0L)))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_pending"),
          min(col("seq")).as("first_pending_seq"),
          max(col("seq")).as("last_pending_seq"))
        .orderBy(col("shard_id"))
    },

    // subscriber/subscriber.go:79-96: nack ⇒ redelivery ⇒ at-least-
    // once. Downstream exactly-once = first-delivery-wins dedup on
    // message UUID (map-side combine; shuffles 1 row per uuid).
    "m7_redelivery_dedup" -> { (s, d) =>
      val msgs = Envelope.messages(s, d)
      val redelivered = msgs.filter(col("event_id") % 7 === 0)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 SECOND"))
      val deliveries = msgs.unionAll(redelivered)
      deliveries.groupBy(col("uuid"))
        .agg(min(col("ts")).as("first_ts"), count(lit(1)).as("n_deliveries"),
          first(col("event_type")).as("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("n_deliveries")).as("n_deliveries"))
        .orderBy(col("event_type"))
    },

    // KCL lease balancing (example/cmd/subscribe/main.go:36-38):
    // deterministic shard→worker assignment + per-worker load.
    "m8_lease_assign" -> { (s, d) =>
      Envelope.withShardSeq(Envelope.messages(s, d))
        .withColumn("worker_id", pmod(col("shard_id"), lit(3L)))
        .groupBy(col("worker_id"))
        .agg(countDistinct(col("shard_id")).as("n_shards"),
          count(lit(1)).as("n_events"))
        .orderBy(col("worker_id"))
    },

    // Consumer-side tumbling-window aggregation (Structured
    // Streaming idiom; batch-verifiable via window arithmetic).
    "m9_tumbling_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
        .select(unix_micros(col("w.start")).as("ws_us"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("ws_us"), col("event_type"))
    },

    // Consumer-side sessionization: 30-min-gap sessions per user.
    "m10_session_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
        .select(col("user_id"), unix_micros(col("sw.start")).as("session_start_us"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start_us"))
    },

    // Dead-letter routing (subscriber/subscriber.go:79-96 ack/nack:
    // a message nacked past max retries must leave the hot loop).
    // Deterministic per-message attempt counts stand in for the
    // nack history; messages exceeding MaxRetries route to the DLQ.
    "m12_dlq_routing" -> { (s, d) =>
      val maxRetries = 3
      Envelope.messages(s, d)
        .withColumn("attempts", (col("event_id") % 5 + 1).cast("long"))
        .withColumn("route",
          when(col("attempts") > maxRetries, "dlq").otherwise("delivered"))
        .groupBy(col("event_type"), col("route"))
        .agg(count(lit(1)).as("n_messages"),
          sum(col("attempts")).as("total_attempts"),
          max(col("attempts")).as("max_attempts"))
        .orderBy(col("event_type"), col("route"))
    },

    // subscriber.go:57-62: a record whose envelope fails to
    // unmarshal is skipped (the reference logs and keeps consuming).
    // Batch contract: corrupt a deterministic subset of envelopes on
    // the wire, parse, route rows by parseability; delivered rows
    // must round-trip their uuid (any parse lossiness shifts the sum).
    "m13_poison_skip" -> { (s, d) =>
      val msgs = Envelope.messages(s, d)
      val wire = msgs.select(col("event_id"), col("event_type"),
        when(col("event_id") % 97 === 0,
          concat(lit("{corrupt "), col("uuid")))
          .otherwise(Envelope.marshalled(msgs)).as("envelope"))
      wire.withColumn("env", Envelope.parsed(col("envelope")))
        .withColumn("route",
          when(col("env").isNull, lit("skipped")).otherwise(lit("delivered")))
        .groupBy(col("route"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("env.uuid").cast("long")).as("sum_uuid"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy(col("route"))
    },

    // Dynamic lease rebalancing (KCL lease balancing when workers
    // join/leave, example/cmd/subscribe/main.go:36-38): shard→worker
    // by RENDEZVOUS (highest-random-weight) hashing, so growing the
    // worker set from 3 to 4 moves ONLY the leases the new worker
    // wins (≈ shards/4) — mod-N reassignment would reshuffle nearly
    // everything. Every moved shard must land on the new worker.
    "m14_lease_rebalance" -> { (s, d) =>
      def owner(nWorkers: Int) = array_max(array((0 until nWorkers).map(w =>
        struct(
          graft.functions.Portable.hash60(
            concat(col("shard_id").cast("string"), lit("|"), lit(w.toString))).as("wt"),
          lit(w.toLong).as("w"))): _*)).getField("w")
      Envelope.messages(s, d)
        .select(Envelope.shardId(col("partition_key")).as("shard_id")).distinct()
        .withColumn("worker_before", owner(3))
        .withColumn("worker_after", owner(4))
        .withColumn("moved",
          when(col("worker_before") =!= col("worker_after"), 1L).otherwise(0L))
        .orderBy(col("shard_id"))
    },

    // Stream-static enrichment: events joined to a broadcast dim
    // (the subscribe example's "enrich then process" loop).
    "m11_stream_enrich" -> { (s, d) =>
      Tables.events(s, d)
        .join(broadcast(Tables.customer(s, d)), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("c_mktsegment"))
    },

    // The pluggable-marshaller seam (publisher.go:48-51, the
    // marshaller.go:24 "TODO Protobuf") exercised with a second,
    // non-JSON wire codec: every message round-trips through the
    // binary TLV envelope, and the oracle pins BOTH legs — n_ok
    // (field-for-field equality after parse(marshal(x))) must equal
    // n_msgs, and wire_bytes must equal the layout's size formula,
    // so a codec that pads, drops, or reorders fails the gate.
    "m15_binary_codec" -> { (s, d) =>
      val msgs = Envelope.messages(s, d)
      msgs
        .withColumn("blob", Envelope.marshalledBin(msgs))
        .withColumn("env", Envelope.parsedBin(col("blob")))
        .withColumn("ok",
          col("env.uuid") === col("uuid") &&
          col("env.payload") === col("payload") &&
          size(col("env.headers")) === size(col("headers")) &&
          Envelope.header(col("env"), "eventType") === col("headers")("eventType") &&
          Envelope.header(col("env"), "source") === col("headers")("source"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_msgs"),
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
          sum(length(col("blob"))).as("wire_bytes"))
        .orderBy(col("event_type"))
    },

    // Consumer-lag monitoring — the KCL/Kinesis "MillisBehindLatest"
    // health metric (subscriber.go:66-73's checkpoint is the lag
    // anchor): per shard, the tip sequence vs the checkpointed
    // sequence (max seq before the checkpoint cut, as in m6) gives
    // lag in messages, and the event-time distance tip−checkpoint
    // gives lag in microseconds (exact integers — no float parity
    // risk). A shard that never checkpointed measures from the
    // stream start. One shard-keyed window shuffle shared with the
    // sequencing itself; the rollup ships one row per shard.
    "m16_consumer_lag" -> { (s, d) =>
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      lagFromCells(lagCells(Envelope.withShardSeq(Envelope.messages(s, d)), cut))
    },

    // Per-shard throughput accounting — the capacity-planning query a
    // stream operator runs before resharding (Kinesis caps each shard
    // at fixed records/sec, so the peak minute, not the average,
    // decides when to split). Two-level aggregation: (shard, minute)
    // counts partial-combine map-side, then one 8-row shard rollup —
    // at 100 TB the minute-bucket cardinality (shards × minutes) is
    // tiny next to the event count, so the second exchange is free.
    "m17_throughput_stats" -> { (s, d) =>
      val perMin = Envelope.messages(s, d)
        .select(Envelope.shardId(col("partition_key")).as("shard_id"),
          col("ts"), date_trunc("minute", col("ts")).as("minute"))
        .groupBy(col("shard_id"), col("minute"))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      perMin.groupBy(col("shard_id"))
        .agg(sum(col("n")).as("n_events"),
          max(col("n")).as("peak_minute"),
          count(lit(1)).as("n_active_minutes"),
          min(col("mn")).as("first_ts"), max(col("mx")).as("last_ts"))
        .withColumn("span_us",
          expr("unix_micros(last_ts)") - expr("unix_micros(first_ts)"))
        .select(col("shard_id"), col("n_events"), col("peak_minute"),
          col("n_active_minutes"), col("span_us"),
          round(when(col("span_us") === 0L, lit(null))
            .otherwise(col("n_events").cast("double") /
              (col("span_us").cast("double") / lit(1000000.0))), 6).as("rate_per_sec"))
        .orderBy(col("shard_id"))
    },

    // Reshard planning — m17 measures per-shard load; this DECIDES.
    // Kinesis capacity is fixed per shard, so a hot shard must SPLIT
    // and cold shards are merge candidates (m14's rendezvous
    // rebalancing only reassigns the existing shard set across
    // workers — it cannot fix a hot shard). Thresholds are relative
    // to the fleet mean (±15%), so the plan is scale-free: the same
    // query sizes an 8-shard test stream and a 10k-shard production
    // one. target_shards = ceil(load / mean) is the split fanout that
    // brings the hot shard back under the fleet average. One
    // shards-sized rollup + a broadcast 1-row total.
    "m20_reshard_plan" -> { (s, d) =>
      val perShard = Envelope.messages(s, d)
        .select(Envelope.shardId(col("partition_key")).as("shard_id"))
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_events"))
      val tot = perShard.agg(sum(col("n_events")).as("total"),
        count(lit(1)).as("n_shards"))
      perShard.crossJoin(broadcast(tot))
        .withColumn("mean_events", col("total").cast("double") / col("n_shards"))
        .withColumn("action",
          when(col("n_events") > col("mean_events") * 1.15, "split")
            .when(col("n_events") < col("mean_events") * 0.85, "merge_candidate")
            .otherwise("keep"))
        .withColumn("target_shards",
          when(col("action") === "split",
            ceil(col("n_events") / col("mean_events")).cast("long"))
            .otherwise(lit(1L)))
        .select(col("shard_id"), col("n_events"),
          round(col("n_events").cast("double") / col("total"), 6).as("share"),
          col("action"), col("target_shards"))
        .orderBy(col("shard_id"))
    },

    // Backlog-drain ETA — the operational question m16 (how far
    // behind) and m17 (how fast the stream flows) exist to answer:
    // starting from the checkpoint cut, how long until a consumer
    // catches the tip? The consumer is modeled at 2× the shard's
    // observed arrival rate (the standard reprocessing provision —
    // a drain factor, not a measurement), so the net drain rate
    // equals the arrival rate and eta = lag / rate. Same single
    // envelope scan + 8-row rollup as m16; every derived column is
    // arithmetic on that rollup, so the query costs one pass at any
    // scale.
    "m21_drain_eta" -> { (s, d) =>
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      drainEtaFromCells(lagCells(Envelope.withShardSeq(Envelope.messages(s, d)), cut))
    },

    // Hot-shard ROOT-CAUSE diagnosis — m17 measures a shard's load
    // and m20 decides to split it, but a split only helps when the
    // load spreads over many partition keys: a single hot KEY rides
    // its md5 hash to exactly one child forever, and the fix is
    // upstream key salting, not resharding. Per shard: events,
    // distinct keys, the hottest key's share, and the disposition
    // m20 should consult (split_effective vs hot_key). A planted
    // 20× burst on one deterministic key (the minimum user id — a
    // 1-row broadcast, no magic constants) must flip its shard to
    // hot_key while every other shard stays splittable.
    // (shard, key) counts partial-combine map-side; the rollup is
    // shards-sized and the per-shard max rides the same aggregate —
    // one scan at any stream volume.
    "m22_hot_key_audit" -> { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"))
      val mu = ev.agg(min(col("user_id")).as("mu"))
      val burst = ev.crossJoin(broadcast(mu))
        .filter(col("user_id") === col("mu"))
        .select(col("user_id"), explode(sequence(lit(1), lit(20))).as("i"))
        .select(col("user_id"))
      val perKey = ev.unionAll(burst)
        .select(Envelope.shardId(col("user_id").cast("string")).as("shard_id"),
          col("user_id"))
        .groupBy(col("shard_id"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      perKey.groupBy(col("shard_id"))
        .agg(sum(col("n")).as("n_events"),
          count(lit(1)).as("n_keys"),
          max(col("n")).as("top_key_n"))
        .withColumn("top_key_share",
          round(col("top_key_n").cast("double") / col("n_events"), 6))
        .withColumn("disposition",
          when(col("top_key_share") > 0.5, "hot_key")
            .otherwise("split_effective"))
        .select(col("shard_id"), col("n_events"), col("n_keys"),
          col("top_key_n"), col("top_key_share"), col("disposition"))
        .orderBy(col("shard_id"))
    },

    // Per-shard COST attribution — m17's throughput accounting joined
    // with m22's key-concentration audit into the one table a capacity
    // owner actually bills against (closes SURVEY §7.14). Provisioned
    // capacity is paid at the PEAK minute while fair-share math uses
    // totals, so both live side by side: cost_share (fraction of fleet
    // events), burst_ratio (peak-minute rate over the shard's own
    // mean — the overprovision factor), and m22's top_key_share. The
    // disposition applies them in precedence order: a >50%-one-key
    // shard gets "isolate_key" (splitting moves the whole key with it
    // — m22's finding), a shard carrying over 2x its fair share gets
    // "split", the rest "keep". Two planted bursts exercise both
    // non-keep branches (the p6/m22 planting idiom): the min user's
    // events x31 concentrate one key past 50% of its shard, and the
    // max user's whole SHARD x3 carries over 2x fair share without
    // any single key dominating. Two shard-keyed aggregates + an
    // 8-row join with a broadcast 1-row fleet total: nothing past the
    // first aggs grows with the stream.
    "m23_shard_cost" -> { (s, d) =>
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
      val mu = ev.agg(min(col("user_id")).as("mu"))
      val hot = ev.crossJoin(broadcast(mu))
        .filter(col("user_id") === col("mu"))
        .withColumn("i", explode(sequence(lit(1), lit(30))))
        .select(col("user_id"), col("ts"))
      val base = ev.unionAll(hot)
        .select(Envelope.shardId(col("user_id").cast("string")).as("shard_id"),
          col("user_id"), col("ts"))
      val busy = ev.agg(max(col("user_id")).as("mx"))
        .select(Envelope.shardId(col("mx").cast("string")).as("busy_shard"))
      val diffuse = base.crossJoin(broadcast(busy))
        .filter(col("shard_id") === col("busy_shard"))
        .withColumn("i", explode(sequence(lit(1), lit(2))))
        .select(col("shard_id"), col("user_id"), col("ts"))
      val all = base.unionAll(diffuse)
      val (minCells, keyCells) = costCells(all)
      shardCostFromCells(minCells, keyCells)
    },

    // RETENTION sizing — the stream-level knob the lag table exists
    // to inform: retention is configured per STREAM (Kinesis
    // IncreaseStreamRetentionPeriod), so the slowest shard's recovery
    // horizon binds everyone. Per shard, the horizon a restart must
    // survive = how far the checkpoint already trails the tip
    // (lag age) PLUS how long catch-up takes at the observed rate
    // (m21's ETA — while draining, retention keeps expiring), with a
    // 25% safety factor, snapped up to whole hours; the stream
    // recommendation is the per-shard max floored at the 24 h
    // service minimum, and `binding` names the shard that set it
    // (the one to fix before paying for longer retention). Derived
    // ENTIRELY from the same mergeable lag cells m16/m21 and the
    // live monitor read — one event scan, 8-row decision frames.
    "m24_retention_sizing" -> { (s, d) =>
      val cut = lit("2024-01-16 00:00:00").cast("timestamp")
      val cells = lagCells(Envelope.withShardSeq(Envelope.messages(s, d)), cut)
        .localCheckpoint()
      val lag = lagFromCells(cells).select(col("shard_id"), col("lag_us"))
      val eta = drainEtaFromCells(cells).select(col("shard_id"), col("eta_sec"))
      val per = lag.join(eta, "shard_id")
        .withColumn("needed_sec",
          round((col("lag_us").cast("double") / 1000000.0 + col("eta_sec")) * 1.25, 6))
        .withColumn("needed_hours",
          greatest(ceil(col("needed_sec") / 3600.0), lit(1L)))
      val fleet = per.agg(max(col("needed_hours")).as("mx"))
      // round 12 (the m19->m24 loop closure): the SAME decision table
      // also sizes the consumer WATERMARK, from the same disorder
      // cells m19 profiles — retention says how long the stream keeps
      // data, the watermark says how long a consumer waits for it,
      // and sizing them apart is how late events get dropped by one
      // side while the other still stores them. Chosen horizon =
      // smallest ladder rung whose fleet-wide late fraction clears
      // LateFloor (falling back to the widest rung); per-shard
      // max_disorder_us rides along so the choice is auditable
      // against m19's profile (spec-tied in CurationSpec).
      val dis = disorderOf(Envelope.messages(s, d)).localCheckpoint()
      val shardDis = dis.groupBy(col("shard_id"))
        .agg(max(col("disorder_us")).as("max_disorder_us"))
      val ladder = dis
        .withColumn("cand_sec", explode(array(WatermarkLadderSec.map(lit): _*)))
        .groupBy(col("cand_sec"))
        .agg((sum(when(col("disorder_us") > col("cand_sec") * 1000000L, 1L)
          .otherwise(0L)).cast("double") / count(lit(1))).as("late_frac"))
      val chosen = ladder.agg(
        coalesce(min(when(col("late_frac") <= LateFloor, col("cand_sec"))),
          max(col("cand_sec"))).as("watermark_sec"))
      per.join(shardDis, "shard_id")
        .crossJoin(broadcast(fleet)).crossJoin(broadcast(chosen))
        .withColumn("stream_retention_hours", greatest(col("mx"), lit(24L)))
        .withColumn("binding", col("needed_hours") === col("mx"))
        .select(col("shard_id"), col("lag_us"), col("eta_sec"),
          col("needed_sec"), col("needed_hours"),
          col("stream_retention_hours"), col("binding"),
          col("max_disorder_us"), col("watermark_sec"))
        .orderBy(col("shard_id"))
    },

    // Replay/backfill window — a consumer reprocessing history between
    // two checkpoint cuts (the KCL TRIM_HORIZON→AT_TIMESTAMP restart):
    // per shard, the contiguous seq range inside the cut interval plus
    // an order-insensitive digest of the replayed ids (what an
    // operator compares across the original and the replay run to
    // prove equivalence). Because per-shard seqs follow arrival order,
    // to_seq − from_seq + 1 must equal n_replayed — gaplessness is
    // part of the contract (spec-asserted).
    "m18_replay_window" -> { (s, d) =>
      val t1 = lit("2024-01-10 00:00:00").cast("timestamp")
      val t2 = lit("2024-01-20 00:00:00").cast("timestamp")
      Envelope.withShardSeq(Envelope.messages(s, d))
        .filter(col("ts") >= t1 && col("ts") < t2)
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_replayed"),
          min(col("seq")).as("from_seq"), max(col("seq")).as("to_seq"),
          md5(concat_ws("|",
            transform(sort_array(collect_list(col("event_id"))),
              x => x.cast("string"))).cast("binary")).as("replay_digest"))
        .orderBy(col("shard_id"))
    },

    // Lateness profile — the measurement that SIZES a watermark. Each
    // event's arrival is its event time plus a deterministic
    // md5-derived network delay (0–600 s); per shard, the high-water
    // mark runs over ARRIVAL order, and an event is late when it
    // arrives more than the 5-min horizon behind it (exactly the rows
    // `withWatermark("ts", "5 minutes")` would drop). The report —
    // late fraction + worst disorder per shard — is what decides
    // whether the horizon is too tight BEFORE a streaming job starts
    // silently discarding data. One window shuffle on shard, then a
    // shards-sized rollup.
    "m19_late_events" -> { (s, d) =>
      disorderOf(Envelope.messages(s, d))
        .withColumn("late", col("disorder_us") > WatermarkUs)
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
          round(sum(when(col("late"), 1L).otherwise(0L)).cast("double") /
            count(lit(1)), 6).as("late_frac"),
          max(col("disorder_us")).as("max_disorder_us"))
        .orderBy(col("shard_id"))
    }
  )

  /** m23's mergeable cells from a slice of sharded events
    * ((shard_id, user_id, ts) rows): (shard, minute) counts and
    * (shard, key) counts — associative sums, so per-micro-batch cells
    * union into the running stores by plain groupBy-sum (the
    * p6/a22 monitor idiom). */
  private[graft] def costCells(events: DataFrame): (DataFrame, DataFrame) = {
    val minCells = events
      .select(col("shard_id"), date_trunc("minute", col("ts")).as("minute"))
      .groupBy(col("shard_id"), col("minute"))
      .agg(count(lit(1)).as("n"))
    val keyCells = events
      .groupBy(col("shard_id"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    (minCells, keyCells)
  }

  /** One live-monitor step: fold a micro-batch's cost cells into the
    * running stores. Store size is (shards × minutes) +
    * (shards × keys) — never the event stream. */
  private[graft] def costCellsStep(minStore: DataFrame, keyStore: DataFrame,
                                   batch: DataFrame): (DataFrame, DataFrame) = {
    val (bm, bk) = costCells(batch)
    (minStore.unionByName(bm).groupBy(col("shard_id"), col("minute"))
       .agg(sum(col("n")).as("n")),
     keyStore.unionByName(bk).groupBy(col("shard_id"), col("user_id"))
       .agg(sum(col("n")).as("n")))
  }

  /** m23's decision layer over the mergeable cells — shared verbatim
    * by the batch query and the streaming cost monitor (StreamingSpec
    * proves streamed ≡ batch), exactly as p6's driftFromCells and
    * a22's policyOfStores share theirs. */
  private[graft] def shardCostFromCells(minCells: DataFrame,
                                        keyCells: DataFrame): DataFrame = {
    val perKey = keyCells
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_keys"), max(col("n")).as("top_key_n"))
    val perShard = minCells
      .groupBy(col("shard_id"))
      .agg(sum(col("n")).as("n_events"), max(col("n")).as("peak_minute"),
        count(lit(1)).as("n_active_minutes"))
    val fleet = perShard
      .agg(sum(col("n_events")).as("fleet_events"),
        count(lit(1)).as("n_shards"))
    perShard.join(perKey, "shard_id").crossJoin(broadcast(fleet))
      .withColumn("top_key_share",
        round(col("top_key_n").cast("double") / col("n_events"), 6))
      .withColumn("mean_per_minute",
        col("n_events").cast("double") / col("n_active_minutes"))
      .withColumn("burst_ratio",
        round(col("peak_minute").cast("double") / col("mean_per_minute"), 6))
      .withColumn("cost_share",
        round(col("n_events").cast("double") / col("fleet_events"), 6))
      .withColumn("disposition",
        when(col("top_key_share") > 0.5, "isolate_key")
          .when(col("cost_share") * col("n_shards") > 2.0, "split")
          .otherwise("keep"))
      .select(col("shard_id"), col("n_events"), col("n_keys"),
        col("top_key_n"), col("top_key_share"), col("peak_minute"),
        round(col("mean_per_minute"), 6).as("mean_per_minute"),
        col("burst_ratio"), col("cost_share"), col("disposition"))
      .orderBy(col("shard_id"))
  }

  /** m16/m21's mergeable per-shard lag cells from any slice of
    * sequenced records ((shard_id, seq, ts) columns — one topic
    * micro-batch or the whole stream): every field is a max or min,
    * so cells from disjoint slices merge by the same max/min rollup
    * ([[lagCellsStep]]) and the store is SHARDS-sized regardless of
    * stream volume (the m23/p6/a22 monitor idiom). `cut` is the
    * checkpoint instant the lag is measured against. */
  private[graft] def lagCells(msgs: DataFrame, cut: Column): DataFrame =
    msgs.groupBy(col("shard_id"))
      .agg(max(col("seq")).as("last_seq"),
        max(when(col("ts") < cut, col("seq"))).as("ckpt_seq"),
        max(col("ts")).as("tip_ts"),
        max(when(col("ts") < cut, col("ts"))).as("ckpt_ts"),
        min(col("ts")).as("start_ts"))

  /** One live-monitor step: fold a micro-batch's lag cells into the
    * running per-shard store. max/max/max/max/min — associative and
    * null-tolerant (max ignores nulls), so batches that straddle the
    * checkpoint cut or arrive out of order fold correctly. */
  private[graft] def lagCellsStep(store: DataFrame, batch: DataFrame,
                                  cut: Column): DataFrame =
    store.unionByName(lagCells(batch, cut))
      .groupBy(col("shard_id"))
      .agg(max(col("last_seq")).as("last_seq"),
        max(col("ckpt_seq")).as("ckpt_seq"),
        max(col("tip_ts")).as("tip_ts"),
        max(col("ckpt_ts")).as("ckpt_ts"),
        min(col("start_ts")).as("start_ts"))

  /** m16's decision layer over the lag cells — shared verbatim by the
    * batch query and the live lag monitor (StreamingSpec proves
    * streamed ≡ batch): lag in messages (tip seq − checkpointed seq)
    * and in event-time microseconds. A shard that never checkpointed
    * measures from the stream start. */
  private[graft] def lagFromCells(cells: DataFrame): DataFrame =
    cells
      .select(col("shard_id"),
        col("last_seq"),
        coalesce(col("ckpt_seq"), lit(0L)).as("ckpt_seq"),
        (col("last_seq") - coalesce(col("ckpt_seq"), lit(0L))).as("lag_msgs"),
        (expr("unix_micros(tip_ts)") -
          expr("unix_micros(coalesce(ckpt_ts, start_ts))")).as("lag_us"))
      .orderBy(col("shard_id"))

  /** m21's decision layer over the SAME lag cells: catch-up ETA from
    * the observed arrival rate (consumer modeled at 2× arrivals, so
    * the net drain rate equals the arrival rate). */
  private[graft] def drainEtaFromCells(cells: DataFrame): DataFrame =
    cells
      .withColumn("ckpt_seq0", coalesce(col("ckpt_seq"), lit(0L)))
      .withColumn("lag_msgs", col("last_seq") - col("ckpt_seq0"))
      .withColumn("span_us",
        expr("unix_micros(tip_ts)") - expr("unix_micros(start_ts)"))
      .withColumn("rate_per_sec",
        when(col("span_us") === 0L, lit(null))
          .otherwise(col("last_seq").cast("double") /
            (col("span_us").cast("double") / lit(1000000.0))))
      .withColumn("eta_sec",
        when(col("rate_per_sec").isNull || col("lag_msgs") === 0L, lit(0.0))
          .otherwise(col("lag_msgs").cast("double") / col("rate_per_sec")))
      .select(col("shard_id"), col("lag_msgs"),
        round(col("rate_per_sec"), 6).as("rate_per_sec"),
        round(col("eta_sec"), 6).as("eta_sec"))
      .orderBy(col("shard_id"))

  def oracle: Map[String, String] = Map(
    // struct_pack fields listed in ascending key order — the kernel
    // serializes headers sorted by key, so the bytes line up.
    "m1_marshal" ->
      s"""SELECT event_id,
         |  to_json(struct_pack(
         |    watermill_message_uuid := event_id::VARCHAR,
         |    data := base64(props::BLOB),
         |    headers := struct_pack(
         |      eventType := event_type,
         |      source := 'svc-' || (user_id % 4)::VARCHAR))) AS envelope
         |FROM ($Ev) e
         |ORDER BY event_id""".stripMargin,

    "m2_unmarshal" ->
      s"""SELECT event_id,
         |  event_id::VARCHAR AS uuid,
         |  user_id::VARCHAR AS partition_key,
         |  props AS payload_str,
         |  event_type AS header_event_type,
         |  'svc-' || (user_id % 4)::VARCHAR AS header_source,
         |  2::BIGINT AS n_headers,
         |  strftime(ts, '$Rfc3339') AS arrival
         |FROM ($Ev) e
         |ORDER BY event_id""".stripMargin,

    "m3_shard_assign" ->
      s"""SELECT event_id, user_id::VARCHAR AS partition_key,
         |  ${shardSql("user_id::VARCHAR")} AS shard_id
         |FROM ($Ev) e
         |ORDER BY event_id""".stripMargin,

    "m4_publish_batches" ->
      s"""WITH seqd AS (
         |  SELECT ${shardSql("user_id::VARCHAR")} AS shard_id,
         |    row_number() OVER (PARTITION BY ${shardSql("user_id::VARCHAR")}
         |                       ORDER BY ts, event_id) AS seq
         |  FROM ($Ev) e)
         |SELECT shard_id, CAST((seq - 1) // 500 AS BIGINT) AS batch_id,
         |  count(*) AS n_records,
         |  CAST(min(seq) AS BIGINT) AS min_seq, CAST(max(seq) AS BIGINT) AS max_seq
         |FROM seqd
         |GROUP BY 1, 2
         |ORDER BY shard_id, batch_id""".stripMargin,

    "m5_per_shard_order" ->
      s"""SELECT event_id, shard_id, CAST(seq AS BIGINT) AS seq FROM (
         |  SELECT event_id, ${shardSql("user_id::VARCHAR")} AS shard_id,
         |    row_number() OVER (PARTITION BY ${shardSql("user_id::VARCHAR")}
         |                       ORDER BY ts, event_id) AS seq
         |  FROM ($Ev) e) t
         |ORDER BY shard_id, seq""".stripMargin,

    "m6_checkpoint_resume" ->
      s"""WITH seqd AS (
         |  SELECT event_id, ts, ${shardSql("user_id::VARCHAR")} AS shard_id,
         |    row_number() OVER (PARTITION BY ${shardSql("user_id::VARCHAR")}
         |                       ORDER BY ts, event_id) AS seq
         |  FROM ($Ev) e),
         |ckpt AS (
         |  SELECT shard_id AS c_shard,
         |    max(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN seq END) AS ckpt_seq
         |  FROM seqd GROUP BY 1)
         |SELECT shard_id, count(*) AS n_pending,
         |  CAST(min(seq) AS BIGINT) AS first_pending_seq,
         |  CAST(max(seq) AS BIGINT) AS last_pending_seq
         |FROM seqd LEFT JOIN ckpt ON shard_id = c_shard
         |WHERE seq > coalesce(ckpt_seq, 0)
         |GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin,

    "m7_redelivery_dedup" ->
      s"""WITH deliveries AS (
         |  SELECT event_id::VARCHAR AS uuid, ts, event_type FROM ($Ev) e
         |  UNION ALL
         |  SELECT event_id::VARCHAR AS uuid, ts + INTERVAL 1 SECOND AS ts, event_type
         |  FROM ($Ev) e WHERE event_id % 7 = 0),
         |uniq AS (
         |  SELECT uuid, min(ts) AS first_ts, count(*) AS n_del,
         |    min(event_type) AS event_type
         |  FROM deliveries GROUP BY uuid)
         |SELECT event_type, count(*) AS n_unique,
         |  CAST(sum(n_del) AS BIGINT) AS n_deliveries
         |FROM uniq
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin,

    "m8_lease_assign" ->
      s"""SELECT shard_id % 3 AS worker_id,
         |  count(DISTINCT shard_id) AS n_shards, count(*) AS n_events
         |FROM (SELECT ${shardSql("user_id::VARCHAR")} AS shard_id FROM ($Ev) e) t
         |GROUP BY 1
         |ORDER BY worker_id""".stripMargin,

    "m9_tumbling_window" ->
      s"""SELECT (epoch_us(ts) // 300000000) * 300000000 AS ws_us, event_type,
         |  count(*) AS n, sum(value) AS sum_value
         |FROM ($Ev) e
         |GROUP BY 1, 2
         |ORDER BY ws_us, event_type""".stripMargin,

    "m10_session_window" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM ($Ev) e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |sessions AS (
         |  SELECT user_id, ts, value,
         |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM marked)
         |SELECT user_id, epoch_us(min(ts)) AS session_start_us,
         |  count(*) AS n_events, sum(value) AS sum_value
         |FROM sessions
         |GROUP BY user_id, sid
         |ORDER BY user_id, session_start_us""".stripMargin,

    "m12_dlq_routing" ->
      s"""SELECT event_type,
         |  CASE WHEN (event_id % 5 + 1) > 3 THEN 'dlq' ELSE 'delivered' END AS route,
         |  count(*) AS n_messages,
         |  CAST(sum(event_id % 5 + 1) AS BIGINT) AS total_attempts,
         |  CAST(max(event_id % 5 + 1) AS BIGINT) AS max_attempts
         |FROM ($Ev) e
         |GROUP BY 1, 2
         |ORDER BY event_type, route""".stripMargin,

    "m13_poison_skip" ->
      s"""WITH routed AS (
         |  SELECT event_type,
         |    CASE WHEN event_id % 97 = 0 THEN 'skipped' ELSE 'delivered' END AS route,
         |    CASE WHEN event_id % 97 = 0 THEN NULL ELSE event_id END AS uuid_back
         |  FROM ($Ev) e)
         |SELECT route, count(*) AS n_records,
         |  CAST(sum(uuid_back) AS BIGINT) AS sum_uuid,
         |  count(DISTINCT event_type) AS n_types
         |FROM routed
         |GROUP BY route
         |ORDER BY route""".stripMargin,

    "m14_lease_rebalance" -> {
      def ownerSql(ws: String, alias: String) =
        s"""SELECT shard_id, arg_max(w, wt) AS $alias FROM (
           |  SELECT shard_id, w,
           |    ('0x' || substring(md5(shard_id::VARCHAR || '|' || w::VARCHAR), 1, 15))::BIGINT AS wt
           |  FROM shards, (SELECT unnest([$ws]) AS w) workers) t
           |GROUP BY shard_id""".stripMargin
      s"""WITH shards AS (
         |  SELECT DISTINCT ${shardSql("user_id::VARCHAR")} AS shard_id FROM ($Ev) e),
         |w3 AS (${ownerSql("0, 1, 2", "worker_before")}),
         |w4 AS (${ownerSql("0, 1, 2, 3", "worker_after")})
         |SELECT s.shard_id, CAST(worker_before AS BIGINT) AS worker_before,
         |  CAST(worker_after AS BIGINT) AS worker_after,
         |  CAST(CASE WHEN worker_before <> worker_after THEN 1 ELSE 0 END AS BIGINT) AS moved
         |FROM shards s JOIN w3 USING (shard_id) JOIN w4 USING (shard_id)
         |ORDER BY shard_id""".stripMargin
    },

    "m11_stream_enrich" ->
      s"""SELECT c_mktsegment, count(*) AS n_events, sum(value) AS sum_value,
         |  count(DISTINCT user_id) AS n_users
         |FROM ($Ev) e JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,

    // The binary layout's exact size: 2 magic/version + four 4-byte
    // lengths (uuid, payload, header count is one more) + per-header
    // 4+klen+4+vlen with keys 'eventType' (9) and 'source' (6) —
    // 45 fixed bytes + the variable field widths. n_ok = n_msgs
    // asserts the lossless round-trip.
    "m15_binary_codec" ->
      s"""SELECT event_type,
         |  count(*) AS n_msgs,
         |  count(*) AS n_ok,
         |  CAST(sum(45 + strlen(event_id::VARCHAR) + strlen(props)
         |    + strlen(event_type)
         |    + strlen('svc-' || (user_id % 4)::VARCHAR)) AS BIGINT) AS wire_bytes
         |FROM ($Ev) e
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin,

    "m16_consumer_lag" ->
      s"""WITH seqd AS (
         |  SELECT event_id, ts, ${shardSql("user_id::VARCHAR")} AS shard_id,
         |    row_number() OVER (PARTITION BY ${shardSql("user_id::VARCHAR")}
         |                       ORDER BY ts, event_id) AS seq
         |  FROM ($Ev) e),
         |agg AS (
         |  SELECT shard_id,
         |    max(seq) AS last_seq,
         |    coalesce(max(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN seq END), 0) AS ckpt_seq,
         |    max(ts) AS tip_ts,
         |    max(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN ts END) AS ckpt_ts,
         |    min(ts) AS start_ts
         |  FROM seqd GROUP BY shard_id)
         |SELECT shard_id,
         |  CAST(last_seq AS BIGINT) AS last_seq,
         |  CAST(ckpt_seq AS BIGINT) AS ckpt_seq,
         |  CAST(last_seq - ckpt_seq AS BIGINT) AS lag_msgs,
         |  CAST(epoch_us(tip_ts) - epoch_us(coalesce(ckpt_ts, start_ts)) AS BIGINT) AS lag_us
         |FROM agg
         |ORDER BY shard_id""".stripMargin,

    "m21_drain_eta" ->
      s"""WITH seqd AS (
         |  SELECT event_id, ts, ${shardSql("user_id::VARCHAR")} AS shard_id,
         |    row_number() OVER (PARTITION BY ${shardSql("user_id::VARCHAR")}
         |                       ORDER BY ts, event_id) AS seq
         |  FROM ($Ev) e),
         |agg AS (
         |  SELECT shard_id,
         |    max(seq) AS last_seq,
         |    coalesce(max(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN seq END), 0) AS ckpt_seq,
         |    min(ts) AS t0, max(ts) AS t1
         |  FROM seqd GROUP BY shard_id),
         |derived AS (
         |  SELECT shard_id,
         |    last_seq - ckpt_seq AS lag_msgs,
         |    CASE WHEN epoch_us(t1) = epoch_us(t0) THEN NULL
         |      ELSE last_seq::DOUBLE / ((epoch_us(t1) - epoch_us(t0))::DOUBLE / 1000000.0)
         |    END AS rate_per_sec
         |  FROM agg)
         |SELECT shard_id,
         |  CAST(lag_msgs AS BIGINT) AS lag_msgs,
         |  round(rate_per_sec, 6) AS rate_per_sec,
         |  round(CASE WHEN rate_per_sec IS NULL OR lag_msgs = 0 THEN 0.0
         |    ELSE lag_msgs::DOUBLE / rate_per_sec END, 6) AS eta_sec
         |FROM derived
         |ORDER BY shard_id""".stripMargin,

    // m16's lag age + m21's eta (both formulas verbatim) → the
    // retention arithmetic; per-shard max floored at 24 h.
    "m24_retention_sizing" ->
      s"""WITH seqd AS (
         |  SELECT event_id, ts, ${shardSql("user_id::VARCHAR")} AS shard_id,
         |    row_number() OVER (PARTITION BY ${shardSql("user_id::VARCHAR")}
         |                       ORDER BY ts, event_id) AS seq
         |  FROM ($Ev) e),
         |agg AS (
         |  SELECT shard_id,
         |    max(seq) AS last_seq,
         |    coalesce(max(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN seq END), 0) AS ckpt_seq,
         |    max(ts) AS tip_ts,
         |    max(CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN ts END) AS ckpt_ts,
         |    min(ts) AS start_ts
         |  FROM seqd GROUP BY shard_id),
         |per AS (
         |  SELECT shard_id,
         |    CAST(epoch_us(tip_ts) - epoch_us(coalesce(ckpt_ts, start_ts)) AS BIGINT) AS lag_us,
         |    round(CASE
         |      WHEN epoch_us(tip_ts) = epoch_us(start_ts)
         |        OR last_seq - ckpt_seq = 0 THEN 0.0
         |      ELSE (last_seq - ckpt_seq)::DOUBLE /
         |        (last_seq::DOUBLE /
         |          ((epoch_us(tip_ts) - epoch_us(start_ts))::DOUBLE / 1000000.0))
         |      END, 6) AS eta_sec
         |  FROM agg),
         |sized AS (
         |  SELECT shard_id, lag_us, eta_sec,
         |    round((lag_us::DOUBLE / 1000000.0 + eta_sec) * 1.25, 6) AS needed_sec
         |  FROM per),
         |hrs AS (
         |  SELECT *, greatest(CAST(ceil(needed_sec / 3600.0) AS BIGINT), 1) AS needed_hours
         |  FROM sized),
         |fleet AS (SELECT max(needed_hours) AS mx FROM hrs),
         |ev2 AS (
         |  SELECT event_id, ${shardSql("user_id::VARCHAR")} AS shard_id,
         |    epoch_us(ts) AS ts_us,
         |    epoch_us(ts) +
         |      (('0x' || substring(md5(event_id::VARCHAR), 1, 15))::BIGINT % 600)
         |        * 1000000 AS arr_us
         |  FROM ($Ev) e),
         |hw2 AS (
         |  SELECT shard_id, ts_us,
         |    max(ts_us) OVER (PARTITION BY shard_id ORDER BY arr_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm_us
         |  FROM ev2),
         |dis AS (
         |  SELECT shard_id,
         |    greatest(0, coalesce(hwm_us - ts_us, 0)) AS disorder_us
         |  FROM hw2),
         |sdis AS (
         |  SELECT shard_id, CAST(max(disorder_us) AS BIGINT) AS max_disorder_us
         |  FROM dis GROUP BY shard_id),
         |lad AS (
         |  SELECT c.cand,
         |    sum(CASE WHEN disorder_us > c.cand * 1000000 THEN 1 ELSE 0 END)::DOUBLE
         |      / count(*) AS late_frac
         |  FROM dis, (SELECT unnest([${WatermarkLadderSec.mkString(", ")}]) AS cand) c
         |  GROUP BY c.cand),
         |wm AS (
         |  SELECT CAST(coalesce(
         |    min(CASE WHEN late_frac <= $LateFloor THEN cand END), max(cand)) AS BIGINT)
         |    AS watermark_sec
         |  FROM lad)
         |SELECT h.shard_id, h.lag_us, h.eta_sec, h.needed_sec, h.needed_hours,
         |  greatest(f.mx, 24) AS stream_retention_hours,
         |  h.needed_hours = f.mx AS binding,
         |  s.max_disorder_us, w.watermark_sec
         |FROM hrs h CROSS JOIN fleet f CROSS JOIN wm w
         |JOIN sdis s ON s.shard_id = h.shard_id
         |ORDER BY h.shard_id""".stripMargin,

    "m17_throughput_stats" ->
      s"""WITH m AS (
         |  SELECT ${shardSql("user_id::VARCHAR")} AS shard_id, ts,
         |    date_trunc('minute', ts) AS minute
         |  FROM ($Ev) e),
         |pm AS (
         |  SELECT shard_id, minute, count(*) AS n,
         |    min(ts) AS mn, max(ts) AS mx
         |  FROM m GROUP BY 1, 2)
         |SELECT shard_id,
         |  CAST(sum(n) AS BIGINT) AS n_events,
         |  CAST(max(n) AS BIGINT) AS peak_minute,
         |  CAST(count(*) AS BIGINT) AS n_active_minutes,
         |  CAST(max(epoch_us(mx)) - min(epoch_us(mn)) AS BIGINT) AS span_us,
         |  round(CASE WHEN max(epoch_us(mx)) = min(epoch_us(mn)) THEN NULL
         |    ELSE sum(n)::DOUBLE /
         |      ((max(epoch_us(mx)) - min(epoch_us(mn)))::DOUBLE / 1000000.0) END, 6) AS rate_per_sec
         |FROM pm GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin,

    "m20_reshard_plan" ->
      s"""WITH per_shard AS (
         |  SELECT ${shardSql("user_id::VARCHAR")} AS shard_id,
         |    count(*)::BIGINT AS n_events
         |  FROM ($Ev) e GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS total,
         |  count(*)::BIGINT AS n_shards FROM per_shard)
         |SELECT shard_id, n_events,
         |  round(n_events::DOUBLE / total, 6) AS share,
         |  CASE WHEN n_events > (total::DOUBLE / n_shards) * 1.15 THEN 'split'
         |       WHEN n_events < (total::DOUBLE / n_shards) * 0.85 THEN 'merge_candidate'
         |       ELSE 'keep' END AS action,
         |  CASE WHEN n_events > (total::DOUBLE / n_shards) * 1.15
         |       THEN CAST(ceil(n_events / (total::DOUBLE / n_shards)) AS BIGINT)
         |       ELSE 1 END AS target_shards
         |FROM per_shard, tot
         |ORDER BY shard_id""".stripMargin,

    "m22_hot_key_audit" ->
      s"""WITH ev AS (SELECT user_id FROM events),
         |mu AS (SELECT min(user_id) AS mu FROM ev),
         |burst AS (
         |  SELECT e.user_id
         |  FROM ev e, mu, unnest(generate_series(1, 20)) AS t(i)
         |  WHERE e.user_id = mu.mu),
         |all_ev AS (SELECT user_id FROM ev UNION ALL SELECT user_id FROM burst),
         |pk AS (
         |  SELECT ${shardSql("user_id::VARCHAR")} AS shard_id, user_id,
         |    count(*) AS n
         |  FROM all_ev GROUP BY 1, 2)
         |SELECT shard_id,
         |  CAST(sum(n) AS BIGINT) AS n_events,
         |  count(*)::BIGINT AS n_keys,
         |  CAST(max(n) AS BIGINT) AS top_key_n,
         |  round(max(n)::DOUBLE / sum(n), 6) AS top_key_share,
         |  CASE WHEN round(max(n)::DOUBLE / sum(n), 6) > 0.5
         |    THEN 'hot_key' ELSE 'split_effective' END AS disposition
         |FROM pk
         |GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin,

    "m23_shard_cost" ->
      s"""WITH ev AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events),
         |mu AS (SELECT min(user_id) AS mu FROM ev),
         |hot AS (
         |  SELECT e.user_id, e.ts
         |  FROM ev e, mu, unnest(generate_series(1, 30)) AS t(i)
         |  WHERE e.user_id = mu.mu),
         |base AS (
         |  SELECT ${shardSql("user_id::VARCHAR")} AS shard_id, user_id, ts
         |  FROM (SELECT user_id, ts FROM ev UNION ALL SELECT user_id, ts FROM hot) u),
         |busy AS (
         |  SELECT ${shardSql("mx::VARCHAR")} AS busy_shard
         |  FROM (SELECT max(user_id) AS mx FROM ev) x),
         |diffuse AS (
         |  SELECT b.shard_id, b.user_id, b.ts
         |  FROM base b, busy, unnest(generate_series(1, 2)) AS t(i)
         |  WHERE b.shard_id = busy.busy_shard),
         |all_ev AS (
         |  SELECT shard_id, user_id, ts FROM base
         |  UNION ALL SELECT shard_id, user_id, ts FROM diffuse),
         |pk AS (
         |  SELECT shard_id, count(*)::BIGINT AS n_keys,
         |    CAST(max(n) AS BIGINT) AS top_key_n
         |  FROM (SELECT shard_id, user_id, count(*) AS n
         |        FROM all_ev GROUP BY 1, 2) k
         |  GROUP BY shard_id),
         |pm AS (
         |  SELECT shard_id, CAST(sum(n) AS BIGINT) AS n_events,
         |    CAST(max(n) AS BIGINT) AS peak_minute,
         |    count(*)::BIGINT AS n_active_minutes
         |  FROM (SELECT shard_id, date_trunc('minute', ts) AS minute,
         |          count(*) AS n
         |        FROM all_ev GROUP BY 1, 2) m
         |  GROUP BY shard_id),
         |fleet AS (
         |  SELECT CAST(sum(n_events) AS BIGINT) AS fleet_events,
         |    count(*)::BIGINT AS n_shards FROM pm)
         |SELECT pm.shard_id, pm.n_events, pk.n_keys, pk.top_key_n,
         |  round(pk.top_key_n::DOUBLE / pm.n_events, 6) AS top_key_share,
         |  pm.peak_minute,
         |  round(pm.n_events::DOUBLE / pm.n_active_minutes, 6) AS mean_per_minute,
         |  round(pm.peak_minute::DOUBLE /
         |    (pm.n_events::DOUBLE / pm.n_active_minutes), 6) AS burst_ratio,
         |  round(pm.n_events::DOUBLE / fleet.fleet_events, 6) AS cost_share,
         |  CASE
         |    WHEN round(pk.top_key_n::DOUBLE / pm.n_events, 6) > 0.5 THEN 'isolate_key'
         |    WHEN round(pm.n_events::DOUBLE / fleet.fleet_events, 6) * fleet.n_shards > 2.0
         |      THEN 'split'
         |    ELSE 'keep' END AS disposition
         |FROM pm JOIN pk ON pm.shard_id = pk.shard_id
         |CROSS JOIN fleet
         |ORDER BY pm.shard_id""".stripMargin,

    "m18_replay_window" ->
      s"""WITH seqd AS (
         |  SELECT event_id, ts, ${shardSql("user_id::VARCHAR")} AS shard_id,
         |    row_number() OVER (PARTITION BY ${shardSql("user_id::VARCHAR")}
         |                       ORDER BY ts, event_id) AS seq
         |  FROM ($Ev) e)
         |SELECT shard_id, count(*)::BIGINT AS n_replayed,
         |  CAST(min(seq) AS BIGINT) AS from_seq,
         |  CAST(max(seq) AS BIGINT) AS to_seq,
         |  md5(string_agg(event_id::VARCHAR, '|' ORDER BY event_id)) AS replay_digest
         |FROM seqd
         |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-20 00:00:00'
         |GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin,

    "m19_late_events" ->
      s"""WITH ev AS (
         |  SELECT event_id, ${shardSql("user_id::VARCHAR")} AS shard_id,
         |    epoch_us(ts) AS ts_us,
         |    epoch_us(ts) +
         |      (('0x' || substring(md5(event_id::VARCHAR), 1, 15))::BIGINT % 600)
         |        * 1000000 AS arr_us
         |  FROM ($Ev) e),
         |hw AS (
         |  SELECT shard_id, ts_us,
         |    max(ts_us) OVER (PARTITION BY shard_id ORDER BY arr_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm_us
         |  FROM ev),
         |f AS (
         |  SELECT shard_id,
         |    greatest(0, coalesce(hwm_us - ts_us, 0)) AS disorder_us
         |  FROM hw)
         |SELECT shard_id, count(*)::BIGINT AS n_events,
         |  CAST(sum(CASE WHEN disorder_us > $WatermarkUs THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
         |  round(sum(CASE WHEN disorder_us > $WatermarkUs THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*), 6) AS late_frac,
         |  CAST(max(disorder_us) AS BIGINT) AS max_disorder_us
         |FROM f
         |GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin
  )
}
