package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.TxTable

/** `spark.readStream.format("graft")` — the tx table as a streaming
  * source: commit versions are offsets, pure-append commits deliver
  * their files, rewrites deliver nothing, and the engine's offset
  * checkpoint + immutable files give exactly-once delivery across
  * stop/restart.
  */
class GraftStreamSourceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def batch(i: Int): DataFrame =
    (0 until 20).map(j =>
      (java.sql.Date.valueOf(s"2024-06-0${i % 3 + 1}"), s"b${i}_$j",
        (i * 100 + j).toLong))
      .toDF("date", "k", "v")

  test("tailing the commit log: rate-limited backfill (one commit per " +
      "micro-batch), live appends arrive, a rewrite commit delivers no " +
      "rows, and restart from checkpoint resumes exactly-once") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamsrc").toString
    val table = s"$dir/t"
    (0 until 3).foreach(i => TxTable.append(spark, batch(i), table))

    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val nonEmptyBatches = new java.util.concurrent.atomic.AtomicInteger
    def start() = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1")
      .load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.select("k", "v").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        seen.synchronized { seen ++= rows }
        if (rows.nonEmpty) nonEmptyBatches.incrementAndGet()
        ()
      }.start()

    val q = start()
    try {
      q.processAllAvailable()
      assert(nonEmptyBatches.get == 3,
        "maxVersionsPerTrigger=1 must deliver one commit per micro-batch")
      assert(seen.size == 60 && seen.distinct.size == 60,
        "backfill delivers every appended row exactly once")
      // a LIVE append is picked up by the running stream
      TxTable.append(spark, batch(3), table)
      q.processAllAvailable()
      assert(seen.size == 80, "live append must arrive")
      // a rewrite commit (z-order: layout-only remove+add) is NOT
      // re-delivered — merges do not re-trigger consumers
      TxTable.zorder(spark, table, Seq("k", "v"))
      q.processAllAvailable()
      assert(seen.size == 80, "rewrite commits must deliver no rows")
    } finally q.stop()

    // offline append + restart from the same checkpoint: only the new
    // commit arrives, nothing replays
    TxTable.append(spark, batch(4), table)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(seen.size == 100,
        s"restart must deliver exactly the offline append (${seen.size})")
      assert(seen.distinct.size == 100, "no replayed duplicates")
      assert(seen.count(_._1.startsWith("b4_")) == 20)
    } finally q2.stop()

    // the streamed multiset equals the table's live content (modulo the
    // compaction rewrite, which changed layout, not rows)
    val tableRows = TxTable.read(spark, table).select("k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(seen.toSet == tableRows)
  }

  test("schema is required up front and the source refuses a missing " +
      "table; batch frames from the source are streaming-flagged") {
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft")
        .load(java.nio.file.Files
          .createTempDirectory("graft_nostream").toString + "/missing")
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamsrc2").toString
    val table = s"$dir/t"
    TxTable.append(spark, batch(0), table)
    val st = spark.readStream.format("graft").load(table)
    assert(st.isStreaming)
    // partition column trails, the HadoopFsRelation convention
    assert(st.schema.fieldNames.toSeq == Seq("k", "v", "date"))
    // a transformed streaming plan runs end to end (watermark-free agg
    // in complete mode)
    val q = st.groupBy("date").agg(sum("v").as("v"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_src_smoke").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("graft_src_smoke").agg(sum("v")).collect()
      .head.getLong(0) == (0 until 20).map(_.toLong).sum)
  }
}
