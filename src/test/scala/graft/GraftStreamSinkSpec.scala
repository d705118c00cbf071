package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{GraftStreamSink, TxTable}

/** `df.writeStream.format("graft")` — micro-batches commit through
  * appendTxn/overwriteTxn with a (writerId, batchId) mark: exactly-once
  * without a hand-written foreachBatch.
  */
class GraftStreamSinkSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("append mode: each micro-batch is one marked commit; a replayed " +
      "batch never lands twice; restart resumes cleanly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamsink").toString
    val table = s"$dir/t"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val rows = mem.toDF().select(
      to_date(concat(lit("2024-07-0"), col("value") % 3 + 1)).as("date"),
      (col("value") % 5).cast("string").as("k"), col("value").as("v"))
    def start() = rows.writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .format("graft").option("path", table).start()
    val q = start()
    try {
      mem.addData(0L until 50L: _*)
      q.processAllAvailable()
      mem.addData(50L until 100L: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(TxTable.read(spark, table).count() == 100)
    // the writerId mark rode the commits (checkpoint-derived default)
    val wid = GraftStreamSink.writerIdFor(
      Map("checkpointLocation" -> s"$dir/ckpt"))
    assert(wid.startsWith("graft-sink-"))
    // a zombie replay of batch 0 through the same sink path is swallowed
    val replay = (0L until 50L).map(v =>
      (java.sql.Date.valueOf(s"2024-07-0${v % 3 + 1}"),
        (v % 5).toString, v)).toDF("date", "k", "v")
    assert(TxTable.appendTxn(spark, replay, table, wid, 0L) == -1L,
      "the sink's marks must guard replays")
    // restart from the same checkpoint: only new data lands
    val q2 = start()
    try {
      mem.addData(100L until 120L: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(TxTable.read(spark, table).count() == 120)
    assert(TxTable.read(spark, table).agg(sum("v")).collect()
      .head.getLong(0) == (0L until 120L).sum)
  }

  test("complete mode overwrites the table per batch (last state wins); " +
      "update mode is refused") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamsink2").toString
    val table = s"$dir/t"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val agg = mem.toDF()
      .select(to_date(lit("2024-07-01")).as("date"),
        (col("value") % 3).cast("string").as("k"), col("value").as("v"))
      .groupBy("date", "k").agg(sum("v").as("v"), count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("graft").option("path", table).start()
    try {
      mem.addData(0L until 30L: _*)
      q.processAllAvailable()
      mem.addData(30L until 60L: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = TxTable.read(spark, table)
    assert(got.count() == 3, "one row per group, not per batch")
    assert(got.agg(sum("v")).collect().head.getLong(0) == (0L until 60L).sum,
      "complete mode must reflect the FULL aggregate state")
    // refused at START time, before any state accrues
    val err = intercept[IllegalArgumentException] {
      agg.writeStream.outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt2")
        .format("graft").option("path", s"$dir/t2").start()
    }
    assert(err.getMessage.contains("foreachBatch"))
  }

  test("TWO concurrent streaming writers with distinct writerIds share " +
      "one table: racing commits serialize, every batch lands exactly " +
      "once, none doubled") {
    // the sink doc warns that COLLIDING writerIds drop batches (their
    // (writerId, batchId) marks dedup each other) — this proves the
    // supported multi-writer shape end to end: two live streaming
    // queries, distinct writerIds, one commit log, micro-batches
    // committed from two engine threads simultaneously so appendTxn's
    // optimistic version claims actually race
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamsink3").toString
    val table = s"$dir/t"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val memA = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val memB = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    def mk(mem: org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[Long],
        wid: String, base: Long) =
      mem.toDF()
        .select(to_date(lit("2024-07-01")).as("date"),
          concat(lit(wid + "_"), col("value")).as("k"),
          (col("value") + base).as("v"))
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt_$wid")
        .format("graft").option("path", table)
        .option("writerId", wid)
        .start()
    val qa = mk(memA, "wa", 0L)
    val qb = mk(memB, "wb", 1000000L)
    try {
      (0 until 5).foreach { r =>
        memA.addData(r * 100L until r * 100L + 100L: _*)
        memB.addData(r * 100L until r * 100L + 100L: _*)
        val ta = new Thread(() => qa.processAllAvailable())
        val tb = new Thread(() => qb.processAllAvailable())
        ta.start(); tb.start(); ta.join(); tb.join()
      }
    } finally { qa.stop(); qb.stop() }
    val rows = TxTable.read(spark, table).select("k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 1000,
      s"2 writers x 500 rows must all land exactly once (${rows.length})")
    assert(rows.map(_._1).distinct.length == 1000,
      "a racing commit duplicated rows")
    val expected = (0L until 500L).sum * 2 + 500L * 1000000L
    assert(rows.map(_._2).sum == expected,
      "a racing commit lost or corrupted a batch")
    // both writers' marks advanced independently — a replay of either
    // writer's batch 0 is still swallowed, per-writer scope intact
    assert(TxTable.appendTxn(spark,
      Seq((java.sql.Date.valueOf("2024-07-01"), "zz", 1L))
        .toDF("date", "k", "v"), table, "wa", 0L) == -1L)
    assert(TxTable.appendTxn(spark,
      Seq((java.sql.Date.valueOf("2024-07-01"), "zz", 1L))
        .toDF("date", "k", "v"), table, "wb", 0L) == -1L)
  }
}
