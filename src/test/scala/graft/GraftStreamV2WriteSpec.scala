package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.TxTable

/** `df.writeStream.format("graft-v2")` — the DSv2 STREAMING WRITE:
  * executors write the epoch's parquet themselves (per-task
  * [[graft.sink.GraftParquetDataWriter]]), the driver publishes
  * exactly the committed tasks' files in ONE marked commit
  * ([[graft.sink.TxTable.commitStreamingEpoch]]). Exactly-once is the
  * same `(writerId, epochId)` mark contract as the v1 sink.
  */
class GraftStreamV2WriteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private implicit val ctx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_v2w_$tag").toString

  private def rows(i: Int): Seq[(java.sql.Date, String, Long)] =
    (0 until 10).map(j =>
      (java.sql.Date.valueOf(s"2024-06-0${i % 3 + 1}"), s"b${i}_$j",
        (i * 100 + j).toLong))

  test("v2 streaming write end-to-end: micro-batches land as marked " +
      "commits, a restart from checkpoint appends exactly the new data, " +
      "and the files are readable through BOTH read paths") {
    val dir = tmp("e2e")
    val table = s"$dir/t"
    val in = MemoryStream[(java.sql.Date, String, Long)]
    def start() = in.toDF.toDF("date", "k", "v")
      .writeStream.format("graft-v2")
      .option("path", table)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()

    in.addData(rows(0): _*)
    in.addData(rows(1): _*)
    val q = start()
    try q.processAllAvailable() finally q.stop()

    val got = TxTable.read(spark, table).select("k", "v").as[(String, Long)]
      .collect().toSet
    assert(got == (rows(0) ++ rows(1)).map(t => (t._2, t._3)).toSet)

    // restart: only the offline-added batch lands, nothing replays
    in.addData(rows(2): _*)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got2 = TxTable.read(spark, table).count()
    assert(got2 == 30, s"restart must append exactly batch 2 (got $got2)")

    // interop: the v2-written table streams back through the v1 source
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val rq = spark.readStream.format("graft").load(table)
      .writeStream.option("checkpointLocation", s"$dir/rckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.select("k").as[String].collect() }
        ()
      }.start()
    try rq.processAllAvailable() finally rq.stop()
    assert(seen.size == 30 && seen.distinct.size == 30)
  }

  test("exactly-once epoch commits: a replayed epoch lands ZERO times " +
      "and never re-indexes; files not in the committed set stay " +
      "unreferenced") {
    val dir = tmp("once")
    val table = s"$dir/t"
    TxTable.append(spark, rows(0).toDF("date", "k", "v"), table)

    // stage one epoch by hand through the real writer machinery
    val df1 = rows(1).toDF("date", "k", "v")
    val sch = df1.schema
    val internal = df1.queryExecution.toRdd.map(_.copy()).collect()
    val w = new graft.sink.GraftParquetDataWriter(table, "d-sdead-e7",
      sch, spark.sessionState.newHadoopConf(), 0, 0L)
    internal.foreach(w.write)
    val msg = w.commit().asInstanceOf[graft.sink.GraftEpochFiles]
    assert(msg.files.nonEmpty)

    // plus one orphan file in the same epoch dir (a speculative
    // attempt's leftovers) that is NOT in the committed message
    val w2 = new graft.sink.GraftParquetDataWriter(table, "d-sdead-e7",
      sch, spark.sessionState.newHadoopConf(), 1, 99L)
    rows(9).toDF("date", "k", "v").queryExecution.toRdd.map(_.copy())
      .collect().foreach(w2.write)
    w2.commit() // closed and on disk, but never reported to the driver

    val v1 = TxTable.commitStreamingEpoch(spark, table, "d-sdead-e7",
      msg.files.toSet, "w1", 7L, sch)
    assert(v1 >= 0)
    assert(TxTable.read(spark, table).count() == 20,
      "only the committed tasks' files may be referenced")

    // replay of the same epoch: metadata-only no-op
    val v2 = TxTable.commitStreamingEpoch(spark, table, "d-sdead-e7",
      msg.files.toSet, "w1", 7L, sch)
    assert(v2 == -1L, "replayed epoch must land zero times")
    assert(TxTable.read(spark, table).count() == 20)

    // an EMPTY epoch still advances the mark so recovery skips it
    val v3 = TxTable.commitStreamingEpoch(spark, table, "d-sdead-e8",
      Set.empty, "w1", 8L, sch)
    assert(v3 >= 0)
    assert(TxTable.commitStreamingEpoch(spark, table, "d-sdead-e8",
      Set.empty, "w1", 8L, sch) == -1L)
  }

  test("complete mode (SupportsTruncate): each epoch atomically " +
      "replaces the live file set with the new aggregate") {
    val dir = tmp("complete")
    val table = s"$dir/t"
    val in = MemoryStream[(java.sql.Date, String, Long)]
    val agg = in.toDF.toDF("date", "k", "v")
      .groupBy("date").agg(sum("v").as("total"))
    def start() = agg.writeStream.format("graft-v2")
      .outputMode("complete")
      .option("path", table)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()

    in.addData((java.sql.Date.valueOf("2024-06-01"), "a", 1L),
      (java.sql.Date.valueOf("2024-06-01"), "b", 2L))
    val q = start()
    try {
      q.processAllAvailable()
      assert(TxTable.read(spark, table).as[(java.sql.Date, Long)]
        .collect().toSet ==
        Set((java.sql.Date.valueOf("2024-06-01"), 3L)))
      in.addData((java.sql.Date.valueOf("2024-06-01"), "c", 10L),
        (java.sql.Date.valueOf("2024-06-02"), "d", 5L))
      q.processAllAvailable()
      assert(TxTable.read(spark, table).as[(java.sql.Date, Long)]
        .collect().toSet ==
        Set((java.sql.Date.valueOf("2024-06-01"), 13L),
          (java.sql.Date.valueOf("2024-06-02"), 5L)),
        "complete mode must replace, not append")
    } finally q.stop()
  }

  test("type coverage + nulls round-trip, and the written footers " +
      "carry usable INT64-micros timestamp stats") {
    val dir = tmp("types")
    val table = s"$dir/t"
    val in = MemoryStream[(java.sql.Date, Option[Long], Option[String],
      Option[Double], Option[Boolean], java.sql.Timestamp)]
    val q = in.toDF
      .toDF("date", "l", "s", "d", "b", "ts")
      .writeStream.format("graft-v2")
      .option("path", table)
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:30:00.123456")
    in.addData(
      (java.sql.Date.valueOf("2024-06-01"), Some(7L), Some("x"),
        Some(1.5), Some(true), t0),
      (java.sql.Date.valueOf("2024-06-01"), None, None, None, None, t0))
    try q.processAllAvailable() finally q.stop()

    val got = TxTable.read(spark, table)
      .select("l", "s", "d", "b", "ts").collect()
    assert(got.length == 2)
    val full = got.find(!_.isNullAt(0)).get
    assert(full.getLong(0) == 7L && full.getString(1) == "x" &&
      full.getDouble(2) == 1.5 && full.getBoolean(3) &&
      full.getTimestamp(4) == t0)
    val nulls = got.find(_.isNullAt(0)).get
    assert((1 to 3).forall(nulls.isNullAt), "absent fields read as null")

    // timestamp pruning works only if the footer has INT64 stats —
    // a ts-range filter over the one live file must stay plannable
    val cnt = TxTable.read(spark, table)
      .filter(col("ts") === lit(t0)).count()
    assert(cnt == 2)
  }

  test("plan-time refusals: missing date column and nested types fail " +
      "actionably at write-plan time, before any file is written") {
    val dir = tmp("refuse")
    val in = MemoryStream[(String, Long)]
    in.addData(("k", 1L))
    val q1 = in.toDF.toDF("k", "v").writeStream.format("graft-v2")
      .option("path", s"$dir/t1")
      .option("checkpointLocation", s"$dir/c1").start()
    val e1 = intercept[Exception] {
      try q1.processAllAvailable() finally q1.stop()
    }
    assert(causeChain(e1).exists(_.contains("date")), causeChain(e1))

    val in2 = MemoryStream[(java.sql.Date, Seq[Long])]
    in2.addData((java.sql.Date.valueOf("2024-06-01"), Seq(1L)))
    val q2 = in2.toDF.toDF("date", "arr").writeStream.format("graft-v2")
      .option("path", s"$dir/t2")
      .option("checkpointLocation", s"$dir/c2").start()
    val e2 = intercept[Exception] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(causeChain(e2).exists(_.contains("unsupported column")),
      causeChain(e2))
    // the refusal happened before any parquet landed
    assert(!new java.io.File(s"$dir/t1").exists() ||
      new java.io.File(s"$dir/t1").listFiles().forall(f =>
        !f.getName.startsWith("d-")))
  }

  private def causeChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).toSeq
}
