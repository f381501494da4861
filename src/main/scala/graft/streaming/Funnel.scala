package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** q44's strict ordered funnel (signup → view ≤1h later → purchase
  * ≤1h after that) over a LIVE event subscription — the streaming
  * analog the reference's consumers would assemble from per-shard
  * batch polls (subscriber.go's GetRecords loop), re-expressed as
  * Structured Streaming keyed state.
  *
  * Why keyed state and not a streamed three-way join: each funnel
  * stage anchors on the user's EARLIEST qualifying event, and "the
  * earliest" is only final once the watermark has passed it — a
  * stream-stream join chain would have to retract results when an
  * earlier signup straggles in. `flatMapGroupsWithState` with an
  * event-time timeout makes the finalization explicit: a user's
  * funnel is emitted exactly once, when the watermark proves the
  * 2-hour window after their first signup can no longer change.
  *
  * State is BOUNDED, which is the whole 100 TB story: per user we
  * hold one minimum signup time plus only the view/purchase times
  * that could still qualify —
  *   - nothing at or below `min(minSignup, watermark)`: a view
  *     qualifies only STRICTLY after the final signup time, and the
  *     final signup time can never drop below the watermark (later
  *     arrivals below it are dropped by the watermark itself), so
  *     such events are provably dead;
  *   - nothing above `minSignup + 2h`: the view window ends at
  *     `minSignup + 1h` and the purchase window at most 1h after a
  *     qualifying view, and `minSignup` only ever decreases, so that
  *     upper bound only tightens.
  * A user who never signs up keeps at most a watermark-deep buffer
  * (first rule) and is evicted by a timeout just past their last
  * buffered event — after which no future signup (all ≥ watermark)
  * could pair with anything buffered. So state per user is O(events
  * in a 2-hour window), independent of stream length, and the state
  * store shards by user exactly like the batch q44's user-keyed
  * shuffles.
  */
object Funnel {

  /** Emitted once per signed-up user when the watermark closes their
    * funnel window; -1 marks a stage never reached. */
  case class FunnelDone(user_id: Long, t_signup_us: Long,
                        t_view_us: Long, t_purchase_us: Long)

  /** minSignup = Long.MaxValue until the first signup arrives. */
  private[streaming] case class FunnelState(
      minSignup: Long, views: List[Long], purchases: List[Long])

  private val HourUs = 3600L * 1000000L

  /** Run the funnel over a stream of (user_id, event_type, ts) rows.
    * `events` must be a streaming DataFrame; rows older than
    * `watermarkDelay` behind the max seen event time are dropped (the
    * same contract as every watermarked operator here — m19's
    * profiler is how the delay gets sized). */
  def funnelStream(events: DataFrame,
                   watermarkDelay: String = "1 minute"): Dataset[FunnelDone] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("ts_us"), col("ts"))
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelDone](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  private def update(uid: Long,
                     rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
                     st: GroupState[FunnelState]): Iterator[FunnelDone] = {
    if (st.hasTimedOut) {
      val s = st.get
      st.remove()
      // a no-signup user's timeout is pure eviction: every buffered
      // event precedes the watermark the timeout just proved, so no
      // future signup (all >= watermark) can pair with any of them
      if (s.minSignup == Long.MaxValue) Iterator.empty
      else Iterator.single(finalizeFunnel(uid, s))
    } else {
      val prev = st.getOption.getOrElse(FunnelState(Long.MaxValue, Nil, Nil))
      var minS = prev.minSignup
      var vs = prev.views
      var ps = prev.purchases
      var maxSeen = Long.MinValue
      rows.foreach { case (_, et, tsUs, _) =>
        if (tsUs > maxSeen) maxSeen = tsUs
        et match {
          case "signup"   => if (tsUs < minS) minS = tsUs
          case "view"     => vs ::= tsUs
          case "purchase" => ps ::= tsUs
          case _          => ()
        }
      }
      val wmUs = st.getCurrentWatermarkMs() * 1000L
      // the two provably-dead cuts from the scaladoc
      val lowCut = math.min(minS, wmUs)
      vs = vs.filter(v => v > lowCut && (minS == Long.MaxValue || v <= minS + HourUs))
      ps = ps.filter(p => p > lowCut && (minS == Long.MaxValue || p <= minS + 2 * HourUs))
      if (minS != Long.MaxValue) {
        st.update(FunnelState(minS, vs, ps))
        // finalize just past the last instant that could still matter;
        // if the watermark already passed it, fire at the next tick
        val fireMs = (minS + 2 * HourUs) / 1000L + 1L
        st.setTimeoutTimestamp(math.max(fireMs, st.getCurrentWatermarkMs() + 1L))
      } else if (vs.nonEmpty || ps.nonEmpty) {
        st.update(FunnelState(minS, vs, ps))
        val lastMs = (vs ++ ps).max / 1000L + 1L
        st.setTimeoutTimestamp(math.max(lastMs, st.getCurrentWatermarkMs() + 1L))
      } else {
        if (st.exists) st.remove()
      }
      Iterator.empty
    }
  }

  private def finalizeFunnel(uid: Long, s: FunnelState): FunnelDone = {
    val tV = s.views.filter(v => v > s.minSignup && v <= s.minSignup + HourUs)
      .sorted.headOption
    val tP = tV.flatMap(v =>
      s.purchases.filter(p => p > v && p <= v + HourUs).sorted.headOption)
    FunnelDone(uid, s.minSignup, tV.getOrElse(-1L), tP.getOrElse(-1L))
  }
}
