package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingFlows

/** W3 semantics: watermarked append-mode windows emit once closed and
  * drop data later than the lateness bound (labeler/worker carry no
  * watermark — ClickHouse absorbs late rows; in Spark the bound is
  * explicit and late rows route to the batch backfill path).
  */
class WatermarkSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 10:$minute%02d:30")

  test("append-mode windows close at the watermark; late rows are dropped") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val agg = StreamingFlows.watermarkedMinuteAgg(
      ms.toDF().toDF("ts", "event_type"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("w3_sink").start()
    try {
      // two events in the 10:00 window, one in 10:01
      ms.addData((ts(0), "click"), (ts(0), "click"), (ts(1), "view"))
      q.processAllAvailable()
      // advance event time far past the 10-minute watermark -> both
      // earlier windows close and emit
      ms.addData((ts(30), "click"))
      q.processAllAvailable()
      val emitted = spark.table("w3_sink")
        .select($"w.start".cast("string"), $"event_type", $"n")
        .as[(String, String, Long)].collect().toSet
      assert(emitted.contains(("2024-03-01 10:00:00", "click", 2L)))
      assert(emitted.contains(("2024-03-01 10:01:00", "view", 1L)))
      // a row for the long-closed 10:00 window arrives late -> dropped
      ms.addData((ts(0), "click"))
      ms.addData((ts(31), "click")) // nudge another batch through
      q.processAllAvailable()
      val after = spark.table("w3_sink")
        .filter($"w.start" === "2024-03-01 10:00:00")
        .agg(org.apache.spark.sql.functions.sum("n"))
        .as[Long].collect().head
      assert(after == 2L, "late row must not reopen the closed window")
    } finally q.stop()
  }

  test("W2 batch-count invariance: watermarked append results are " +
    "identical with 1, 2, and 4 snapshot files") {
    import org.apache.spark.sql.functions._
    // the claim argued in StreamingFlows.eventsDir's doc (time-ranged
    // snapshots -> nothing is late-dropped regardless of how the input
    // is batched), proved for the two gated stateful shapes
    def sessions(files: Int): Seq[String] = {
      val agg = StreamingFlows.eventsStream(spark, sf, files)
        .withWatermark("ts", "10 minutes")
        .groupBy(col("user_id"),
          session_window(col("ts"), "86400 seconds").as("w"))
        .agg(count(lit(1)).as("n_events"))
      StreamingFlows.runToMemoryAppend(spark, agg)
        .select(col("user_id"), col("w.start"), col("w.end"),
          col("n_events"))
        .collect().map(_.toString).sorted.toSeq
    }
    def flowSummed(files: Int): Seq[String] =
      StreamingFlows.runToMemoryAppend(spark,
        StreamingFlows.watermarkedFlowPipeline(spark, sf, files = files))
        .collect().map(_.toString).sorted.toSeq
    val s = Seq(1, 2, 4).map(sessions)
    assert(s(0).nonEmpty && s(1) == s(0) && s(2) == s(0),
      "sessionization must be invariant to micro-batch count")
    val f = Seq(1, 2, 4).map(flowSummed)
    assert(f(0).nonEmpty && f(1) == f(0) && f(2) == f(0),
      "watermarked flow summing must be invariant to micro-batch count")
  }

  test("session_window boundary: a gap EXACTLY equal to the gap duration " +
    "still MERGES (inclusive end — the oracle breaks only on > gap)") {
    import org.apache.spark.sql.functions._
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    def plus(sec: Long) = new Timestamp(t0.getTime + sec * 1000)
    val e = Seq((1L, t0), (1L, plus(60)), // merges: diff < gap
      (1L, plus(60 + 120)), // exactly gap after the 2nd -> still merges
      (1L, plus(60 + 120 + 121)), // gap + 1s -> NEW session
      (2L, plus(0)), (2L, plus(119))) // diff = gap-1s -> merges
      .toDF("user_id", "ts")
    val sessions = e.groupBy(col("user_id"),
        session_window(col("ts"), "120 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(sessions == Seq((1L, 1L), (1L, 3L), (2L, 2L)),
      s"got $sessions: user 1 = [3-event session incl. the exact-gap " +
        "event, then a 1-event session past gap+1]")
  }
}
