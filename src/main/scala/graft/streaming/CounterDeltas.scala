package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation of a flow's ABSOLUTE conntrack counters. The
  * reference avoids this case by dumping with `ZeroCounters:true`
  * (pkg/collector/conntrack.go:7-9 — the kernel zeroes counters at
  * read, so every dump already IS a delta). When zeroing is
  * unavailable (unprivileged netlink, third-party exporters), the
  * collector must diff consecutive absolute readings itself — a
  * per-flow stateful computation.
  */
case class AbsCounters(flow_key: Long, ts: java.sql.Timestamp,
    abs_pkts: Long, abs_bytes: Long)

/** Last seen absolute reading per flow. */
case class CounterState(last_pkts: Long, last_bytes: Long)

/** The reconstructed delta — the same shape the zeroing dump emits. */
case class CounterDelta(flow_key: Long, ts: java.sql.Timestamp,
    d_pkts: Long, d_bytes: Long)

/** Absolute-counter → delta reconstruction as a
  * `flatMapGroupsWithState` operator: the KeyValueGroupedDataset custom
  * state surface, used where windowed aggregation genuinely cannot
  * express the semantics (each output row depends on the PREVIOUS
  * observation of the same key, not on a window fold).
  *
  * Semantics per flow key, observations in ts order:
  *  - first observation: the counters started from zero when the
  *    conntrack entry was created, so the whole absolute value is the
  *    delta;
  *  - monotone step: delta = abs − last;
  *  - decrease: the conntrack entry was recycled (flow expired and a
  *    new one reused the tuple) — counters restarted from zero, so the
  *    new absolute value is again the whole delta. This mirrors how a
  *    zeroing dump would have seen the new entry.
  *
  * Scale shape: state is ONE record (two longs) per live flow key,
  * partitioned by the groupByKey exchange like any streaming agg, and
  * evicted by an EVENT-TIME timeout sized to the conntrack entry
  * lifetime — state is bounded by the number of LIVE flows, not by
  * stream length. Event-time (not processing-time) eviction keeps the
  * operator deterministic: the timeout fires when the WATERMARK passes
  * last-seen + ttl, so replays and catch-up runs evict identically —
  * and a processing-time timeout would also make the micro-batch
  * engine poll batches on the wall clock, which a synchronous test
  * harness can never drain. (An idle flow whose state was evicted
  * re-enters as "first observation"; its standing counters are
  * re-emitted once — at-least-once on the boundary, exactly what a
  * restarted reference agent does.)
  */
object CounterDeltas {

  def deltas(obs: Dataset[AbsCounters],
      lateness: String = "10 minutes",
      stateTtlMs: Long = 30L * 60 * 1000): Dataset[CounterDelta] = {
    import obs.sparkSession.implicits._
    obs.withWatermark("ts", lateness)
      .groupByKey(_.flow_key)
      .flatMapGroupsWithState[CounterState, CounterDelta](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[AbsCounters],
            state: GroupState[CounterState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // micro-batch iterators carry no ordering guarantee
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption
            val out = sorted.map { o =>
              val d = st match {
                case Some(CounterState(lp, lb))
                    if o.abs_pkts >= lp && o.abs_bytes >= lb =>
                  CounterDelta(key, o.ts, o.abs_pkts - lp, o.abs_bytes - lb)
                case _ => // first sighting or recycled entry
                  CounterDelta(key, o.ts, o.abs_pkts, o.abs_bytes)
              }
              st = Some(CounterState(o.abs_pkts, o.abs_bytes))
              d
            }
            st.foreach(state.update)
            state.setTimeoutTimestamp(
              sorted.map(_.ts.getTime).max + stateTtlMs)
            out.iterator
          }
      }
  }
}
