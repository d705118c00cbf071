package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{AbsCounters, CounterDeltas}

/** Absolute-counter delta reconstruction (the no-ZeroCounters collector
  * variant) via flatMapGroupsWithState: per-key state carries the last
  * absolute reading ACROSS micro-batches; a counter decrease means the
  * conntrack entry was recycled and restarts the baseline.
  */
class CounterDeltasSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)

  test("deltas reconstruct across batches; resets restart the baseline") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[AbsCounters]
    val q = CounterDeltas.deltas(ms.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("deltas_sink").start()
    try {
      // batch 1: two readings of flow 1 (order shuffled — the operator
      // must sort within the batch), first sighting of flow 2
      ms.addData(
        AbsCounters(1L, ts(5), 15, 160),
        AbsCounters(1L, ts(0), 10, 100),
        AbsCounters(2L, ts(0), 5, 50))
      q.processAllAvailable()
      // batch 2: flow 1 advances (state survived the batch boundary),
      // then its conntrack entry is recycled: counters drop
      ms.addData(
        AbsCounters(1L, ts(10), 18, 200),
        AbsCounters(1L, ts(15), 3, 30))
      q.processAllAvailable()
      val got = spark.table("deltas_sink")
        .as[graft.streaming.CounterDelta].collect()
        .map(d => (d.flow_key, d.ts, d.d_pkts, d.d_bytes)).toSet
      assert(got == Set(
        (1L, ts(0), 10L, 100L),  // first sighting: full absolute value
        (1L, ts(5), 5L, 60L),    // monotone step within the batch
        (2L, ts(0), 5L, 50L),    // independent key
        (1L, ts(10), 3L, 40L),   // cross-batch step against saved state
        (1L, ts(15), 3L, 30L)))  // reset: new absolute is the delta
      // conservation: per key, deltas sum to the absolute high-water
      // marks across baseline epochs (10->18 then restart at 3)
      val sums = spark.table("deltas_sink")
        .groupBy("flow_key")
        .agg(org.apache.spark.sql.functions.sum("d_pkts").as("p"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sums == Map(1L -> 21L, 2L -> 5L))
    } finally q.stop()
  }
}
