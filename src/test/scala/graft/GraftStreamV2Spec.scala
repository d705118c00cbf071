package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.TxTable

/** `spark.readStream.format("graft-v2")` — the DataSourceV2
  * `MicroBatchStream` delivery path over the SAME planner state
  * machine as the v1 source: identical offsets (byte-identical JSON,
  * so checkpoints written by one path restart through the other),
  * identical integrity failures, column pruning negotiated through
  * `SupportsPushDownRequiredColumns`, rows produced by the public
  * parquet-mr reader instead of a re-rooted batch DataFrame.
  */
class GraftStreamV2Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def batch(i: Int): DataFrame =
    (0 until 20).map(j =>
      (java.sql.Date.valueOf(s"2024-06-0${i % 3 + 1}"), s"b${i}_$j",
        (i * 100 + j).toLong))
      .toDF("date", "k", "v")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_v2_$tag").toString

  test("v2 tail: rate-limited backfill (one commit per micro-batch), " +
      "live append arrives, layout-only rewrite delivers nothing, and " +
      "restart from checkpoint resumes exactly-once") {
    val dir = tmp("tail")
    val table = s"$dir/t"
    (0 until 3).foreach(i => TxTable.append(spark, batch(i), table))

    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val nonEmpty = new java.util.concurrent.atomic.AtomicInteger
    def start() = spark.readStream.format("graft-v2")
      .option("maxVersionsPerTrigger", "1")
      .load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.select("k", "v").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        seen.synchronized { seen ++= rows }
        if (rows.nonEmpty) nonEmpty.incrementAndGet()
        ()
      }.start()

    val q = start()
    try {
      q.processAllAvailable()
      assert(nonEmpty.get == 3,
        "maxVersionsPerTrigger=1 must deliver one commit per micro-batch")
      assert(seen.size == 60 && seen.distinct.size == 60)
      TxTable.append(spark, batch(3), table)
      q.processAllAvailable()
      assert(seen.size == 80, "live append must arrive")
      TxTable.zorder(spark, table, Seq("k", "v"))
      q.processAllAvailable()
      assert(seen.size == 80, "layout-only rewrites must deliver no rows")
    } finally q.stop()

    TxTable.append(spark, batch(4), table)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(seen.size == 100,
        s"restart must deliver exactly the offline append (${seen.size})")
      assert(seen.distinct.size == 100, "no replayed duplicates")
    } finally q2.stop()

    val tableRows = TxTable.read(spark, table).select("k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(seen.toSet == tableRows)
  }

  test("deletion vectors in stream backfill: a fresh stream's initial " +
      "snapshot of a vectored table delivers only live rows — both " +
      "delivery paths (v1 readFileSet, v2 per-file readers)") {
    Seq("graft", "graft-v2").foreach { format =>
      val dir = tmp(s"dvsnap_${format.replace("-", "")}")
      val table = s"$dir/t"
      (0 until 3).foreach(i => TxTable.append(spark, batch(i), table))
      // vector out every v % 10 == 7 row, then force the fresh stream
      // down the SNAPSHOT path (the delete-mor commit is destructive,
      // so per-commit replay is off the table for a fresh reader)
      assert(TxTable.deleteMergeOnRead(spark, table, col("v") % 10 === 7) > 0)
      val live = TxTable.read(spark, table).select("k", "v").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(live.nonEmpty && !live.exists(_._2 % 10 == 7))
      val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val q = spark.readStream.format(format)
        .load(table)
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (df: DataFrame, _: Long) =>
          val rows = df.select("k", "v").collect()
            .map(r => (r.getString(0), r.getLong(1)))
          seen.synchronized { seen ++= rows }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      assert(seen.toSet == live && seen.size == live.size,
        s"$format snapshot must subtract the vector " +
          s"(delivered ${seen.size}, live ${live.size})")
    }
  }

  test("checkpoint interop: a checkpoint written by the v1 path " +
      "restarts through the v2 path (and back) — the offset JSON is " +
      "the contract, not the delivery code") {
    val dir = tmp("interop")
    val table = s"$dir/t"
    (0 until 2).foreach(i => TxTable.append(spark, batch(i), table))

    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def start(format: String) = spark.readStream.format(format)
      .load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.select("k", "v").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        seen.synchronized { seen ++= rows }
        ()
      }.start()

    val q1 = start("graft")
    try { q1.processAllAvailable() } finally q1.stop()
    assert(seen.size == 40, "v1 backfill delivers both commits")

    // offline append, then the SAME checkpoint through the v2 path:
    // only the new commit arrives — the v1-written offset decodes
    TxTable.append(spark, batch(2), table)
    val q2 = start("graft-v2")
    try { q2.processAllAvailable() } finally q2.stop()
    assert(seen.size == 60 && seen.distinct.size == 60,
      s"v2 restart over a v1 checkpoint must deliver exactly the new " +
        s"commit (${seen.size})")

    // and back: v1 over the v2-advanced checkpoint
    TxTable.append(spark, batch(3), table)
    val q3 = start("graft")
    try { q3.processAllAvailable() } finally q3.stop()
    assert(seen.size == 80 && seen.distinct.size == 80,
      s"v1 restart over a v2-advanced checkpoint (${seen.size})")
  }

  test("v2 chunked initial snapshot: a rewritten history starts from " +
      "the snapshot in maxFilesPerTrigger-bounded chunks, survives a " +
      "mid-snapshot restart, then tails new commits") {
    val dir = tmp("snap")
    val table = s"$dir/t"
    (0 until 3).foreach(i => TxTable.append(spark, batch(i), table))
    // a delete rewrites history → per-commit replay is unsound →
    // snapshot mode
    assert(TxTable.delete(spark, table, col("k") === "b0_0") >= 0)
    val expected = TxTable.read(spark, table).select("k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val batches = new java.util.concurrent.atomic.AtomicInteger
    def start() = spark.readStream.format("graft-v2")
      .option("maxFilesPerTrigger", "1")
      .load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.select("k", "v").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        seen.synchronized { seen ++= rows }
        if (rows.nonEmpty) {
          batches.incrementAndGet()
          // stop mid-snapshot on the first run: the restart must
          // resume from the chunk offset, not replay or skip
          if (batches.get == 1 && seen.size < expected.size)
            throw new RuntimeException("deliberate mid-snapshot stop")
        }
        ()
      }.start()

    val q1 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    val afterCrash = seen.size

    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(batches.get > 1, "the snapshot must arrive chunked")
      // the crashed batch REPLAYS (its foreachBatch threw before the
      // engine committed it) — dedupe, then require exact coverage
      assert(seen.toSet == expected,
        s"chunk union must equal the post-delete table " +
          s"(crashed at $afterCrash, total ${seen.size})")
      // then the stream TAILS: a live append after the snapshot
      TxTable.append(spark, batch(7), table)
      q2.processAllAvailable()
      assert(seen.count(_._1.startsWith("b7_")) == 20,
        "post-snapshot tail must deliver the live append")
    } finally q2.stop()
  }

  test("v2 failure parity: a destructive rewrite mid-stream fails " +
      "loudly naming skipChangeCommits; with the option set the " +
      "rewrite is skipped") {
    val dir = tmp("fail")
    val table = s"$dir/t"
    TxTable.append(spark, batch(0), table)

    def run(skip: Boolean, deleteKey: String): Either[String, Int] = {
      val n = new java.util.concurrent.atomic.AtomicInteger
      val rd = spark.readStream.format("graft-v2")
      val q = (if (skip) rd.option("skipChangeCommits", "true") else rd)
        .load(table)
        .writeStream
        .option("checkpointLocation",
          s"$dir/ckpt_${if (skip) "skip" else "strict"}")
        .foreachBatch { (df: DataFrame, _: Long) =>
          n.addAndGet(df.count().toInt); ()
        }.start()
      try {
        q.processAllAvailable()
        assert(TxTable.delete(spark, table, col("k") === deleteKey) >= 0)
        TxTable.append(spark, batch(5), table)
        q.processAllAvailable()
        Right(n.get)
      } catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          Left(e.getCause.getMessage)
      } finally q.stop()
    }

    run(skip = false, deleteKey = "b0_1") match {
      case Left(msg) =>
        assert(msg.contains("skipChangeCommits") && msg.contains(table),
          s"the failure must name the table and the remedy: $msg")
      case Right(n) => fail(
        s"a destructive rewrite must fail the strict v2 stream (got $n)")
    }
    // fresh consumer with the option: the delete is SKIPPED (the
    // consumer keeps the row it already received — the documented
    // trade of skipChangeCommits) and the append is delivered, so
    // delivered = live + 1 (the one row the skipped delete removed)
    run(skip = true, deleteKey = "b0_2") match {
      case Right(n) =>
        val live = TxTable.read(spark, table).count().toInt
        assert(n == live + 1,
          s"skip path delivers the pre-delete snapshot + append " +
            s"($n vs live $live)")
      case Left(msg) => fail(s"skipChangeCommits path failed: $msg")
    }
  }

  test("v2 column pruning + type coverage: a pruned select reads only " +
      "the requested columns (verified through the scan description) " +
      "and every supported primitive round-trips — incl. timestamps") {
    val dir = tmp("prune")
    val table = s"$dir/t"
    val df = (0 until 10).map { i =>
      (java.sql.Date.valueOf("2024-06-01"), s"k$i", i.toLong, i * 1.5,
        i % 2 == 0, java.sql.Timestamp.valueOf(s"2024-06-01 12:00:0$i"))
    }.toDF("date", "k", "v", "x", "flag", "ts")
    TxTable.append(spark, df, table)

    // full-width round-trip (timestamps exercise the INT96/INT64 paths)
    val all = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Double, Boolean, java.sql.Timestamp)]
    val q = spark.readStream.format("graft-v2").load(table)
      .writeStream.option("checkpointLocation", s"$dir/ckpt1")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.select("k", "v", "x", "flag", "ts").collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3),
            r.getTimestamp(4)))
        all.synchronized { all ++= rows }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(all.size == 10)
    assert(all.map(_._2).sum == 45L && all.map(_._3).sum == 67.5)
    assert(all.count(_._4) == 5)
    assert(all.map(_._5.toString).min == "2024-06-01 12:00:00.0")

    // pruned: only (k, v) — and the date partition column derives
    // from the path, never the parquet footer
    val pruned = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q2 = spark.readStream.format("graft-v2").load(table)
      .select("k", "v")
      .writeStream.option("checkpointLocation", s"$dir/ckpt2")
      .foreachBatch { (b: DataFrame, _: Long) =>
        assert(b.columns.toSeq == Seq("k", "v"))
        val rows = b.collect().map(r => (r.getString(0), r.getLong(1)))
        pruned.synchronized { pruned ++= rows }
        ()
      }.start()
    try q2.processAllAvailable() finally q2.stop()
    assert(pruned.size == 10 && pruned.map(_._2).sum == 45L)

    // pruned to ONLY the path-derived partition column: no parquet
    // column is needed, yet every row must still be delivered (the
    // reader keeps one physical column as a row driver)
    val dates = scala.collection.mutable.ArrayBuffer.empty[String]
    val q3 = spark.readStream.format("graft-v2").load(table)
      .select("date")
      .writeStream.option("checkpointLocation", s"$dir/ckpt3")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect().map(_.getDate(0).toString)
        dates.synchronized { dates ++= rows }
        ()
      }.start()
    try q3.processAllAvailable() finally q3.stop()
    assert(dates.size == 10 && dates.forall(_ == "2024-06-01"))
  }

  test("v2 COLUMNAR delivery (the default) equals the row reader — " +
      "full width, evolved schema (old files read the added column " +
      "as NULL vectors), and the date partition vector") {
    import org.apache.spark.sql.types.{DoubleType, StructField}
    val dir = tmp("columnar")
    val table = s"$dir/t"
    TxTable.append(spark, batch(0), table)
    TxTable.addColumns(spark, table, Seq(StructField("w", DoubleType)))
    TxTable.append(spark,
      batch(1).withColumn("w", col("v").cast("double") * 0.5), table)

    def drain(columnar: Boolean): Set[(String, String, Long, Option[Double])] = {
      val acc = scala.collection.mutable.Set
        .empty[(String, String, Long, Option[Double])]
      val q = spark.readStream.format("graft-v2")
        .option("columnarReader", columnar.toString)
        .load(table)
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt_$columnar")
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = b.select("date", "k", "v", "w").collect().map(r =>
            (r.getDate(0).toString, r.getString(1), r.getLong(2),
              if (r.isNullAt(3)) None else Some(r.getDouble(3))))
          acc.synchronized { acc ++= rows }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      acc.toSet
    }
    val colRows = drain(columnar = true)
    val rowRows = drain(columnar = false)
    assert(colRows.size == 40)
    assert(colRows == rowRows,
      "columnar and row delivery must produce identical rows")
    assert(colRows.count(_._4.isEmpty) == 20,
      "pre-evolution files read the added column as NULL")
    assert(colRows.count(_._4.isDefined) == 20)
  }

  test("v2 rejects what it cannot honor, at plan time: readChangeFeed " +
      "names the v1 remedy") {
    val dir = tmp("reject")
    val table = s"$dir/t"
    TxTable.append(spark, batch(0), table)
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-v2")
        .option("readChangeFeed", "true").load(table)
    }
    assert(e.getMessage.contains("v1-only") &&
      e.getMessage.contains("graft"))
  }

  test("v2 restart with a DIFFERENT maxFilesPerTrigger resumes the " +
      "chunked snapshot from the committed chunk — the explicit-start " +
      "priming path, not a recovery-getBatch side effect") {
    val dir = tmp("relimit")
    val table = s"$dir/t"
    (0 until 3).foreach(i => TxTable.append(spark, batch(i), table))
    assert(TxTable.delete(spark, table, col("k") === "b1_1") >= 0)
    val expected = TxTable.read(spark, table).select("k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val stopAfterFirst = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start(mft: Int) = spark.readStream.format("graft-v2")
      .option("maxFilesPerTrigger", mft.toString)
      .load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.select("k", "v").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        seen.synchronized { seen ++= rows }
        if (rows.nonEmpty && stopAfterFirst.getAndSet(false))
          throw new RuntimeException("deliberate stop after first chunk")
        ()
      }.start()

    val q1 = start(mft = 1)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()

    // resume with a LARGER chunk size: the engine hands the committed
    // chunk offset to latestOffset(start, _) — primeFrom must restore
    // the mid-snapshot state before the new limit slices the rest
    val q2 = start(mft = 100)
    try {
      q2.processAllAvailable()
      assert(seen.toSet == expected,
        s"resumed snapshot under a changed limit must cover exactly " +
          s"the table (${seen.size} rows incl. the replayed chunk)")
    } finally q2.stop()
  }

  test("v2 lagging past expireLog fails actionably through " +
      "planInputPartitions — same message, different engine path") {
    val dir = tmp("expire")
    val table = s"$dir/t"
    (0 until 3).foreach(i => TxTable.append(spark, batch(i), table))

    val seen = new java.util.concurrent.atomic.AtomicInteger
    def start() = spark.readStream.format("graft-v2")
      .option("maxVersionsPerTrigger", "1")
      .load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        seen.addAndGet(df.count().toInt); ()
      }.start()
    val q = start()
    try { q.processAllAvailable() } finally q.stop()
    assert(seen.get == 60)

    // two more commits land, then the log is expired past them — the
    // parked consumer's next range is gone
    TxTable.append(spark, batch(3), table)
    TxTable.append(spark, batch(4), table)
    TxTable.checkpoint(spark, table)
    assert(TxTable.expireLog(spark, table).nonEmpty)

    val q2 = start()
    val msg = intercept[
      org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }.getCause.getMessage
    q2.stop()
    assert(msg.contains("expireLog") && msg.contains(table) &&
      msg.contains("fresh checkpoint"),
      s"the lag failure must name the sweep and the remedy: $msg")
  }

  test("v2 refuses a missing table at scan-plan time, naming the " +
      "remedy (load() itself stays lazy so the WRITE path can target " +
      "a not-yet-existing table)") {
    val dir = tmp("missing")
    val q = spark.readStream.format("graft-v2").load(s"$dir/absent")
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (_: DataFrame, _: Long) => () }.start()
    val e = intercept[Exception] {
      try q.processAllAvailable() finally q.stop()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("existing table")), msgs)
  }

  test("v2 Trigger.AvailableNow drains the whole backlog under the " +
      "rate limit, then stops — commits landing after query start wait") {
    val dir = tmp("availnow")
    val table = s"$dir/t"
    (0 until 4).foreach(i => TxTable.append(spark, batch(i), table))

    val n = new java.util.concurrent.atomic.AtomicInteger
    val batches = new java.util.concurrent.atomic.AtomicInteger
    val q = spark.readStream.format("graft-v2")
      .option("maxVersionsPerTrigger", "1")
      .load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        val c = df.count().toInt
        n.addAndGet(c)
        if (c > 0) batches.incrementAndGet()
        ()
      }.start()
    assert(q.awaitTermination(120000), "AvailableNow must terminate")
    assert(n.get == 80, s"drain must deliver the full backlog (${n.get})")
    assert(batches.get == 4,
      s"the rate limit must keep chunking under AvailableNow " +
        s"(${batches.get} batches)")
  }
}
