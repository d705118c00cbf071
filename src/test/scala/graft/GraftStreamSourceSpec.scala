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

  test("a data-changing rewrite mid-stream FAILS loudly (naming table, " +
      "range, and skipChangeCommits); with skipChangeCommits=true the " +
      "rewrite is skipped and later appends still arrive") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamdest").toString
    val table = s"$dir/t"
    (0 until 2).foreach(i => TxTable.append(spark, batch(i), table))

    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def start(skip: Boolean) = {
      val rd = spark.readStream.format("graft")
      (if (skip) rd.option("skipChangeCommits", "true") else rd)
        .load(table)
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (df: DataFrame, _: Long) =>
          val ks = df.select("k").collect().map(_.getString(0))
          seen.synchronized { seen ++= ks }
          ()
        }.start()
    }

    val q = start(skip = false)
    try { q.processAllAvailable(); assert(seen.size == 40) }
    finally q.stop()

    // while stopped: a delete (copy-on-write remove+add, DESTRUCTIVE)
    // and a fresh append land; the restarted stream's next range must
    // refuse the rewrite
    assert(TxTable.delete(spark, table, col("k") === "b0_0") >= 0)
    TxTable.append(spark, batch(2), table)
    val q1 = start(skip = false)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q1.processAllAvailable() finally q1.stop()
    }
    val msg = ex.getCause.getMessage
    assert(msg.contains(table), s"error must name the table: $msg")
    assert(msg.contains("(1, 3]"), s"error must name the range: $msg")
    assert(msg.contains("skipChangeCommits"),
      s"error must name the remedy option: $msg")

    // same checkpoint, rewrites tolerated: the failed batch replays,
    // the delete commit delivers nothing, the append lands exactly once
    val q2 = start(skip = true)
    try {
      q2.processAllAvailable()
      assert(seen.size == 60 && seen.distinct.size == 60,
        s"append past a skipped rewrite must arrive exactly once " +
          s"(${seen.size})")
      assert(seen.count(_.startsWith("b2_")) == 20)
    } finally q2.stop()
  }

  test("a consumer lagging past expireLog fails actionably, and a FRESH " +
      "stream on a swept/rewritten history gets an initial snapshot") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamexp").toString
    val table = s"$dir/t"
    (0 until 3).foreach(i => TxTable.append(spark, batch(i), table))

    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def start(ckpt: String) = spark.readStream.format("graft")
      .option("maxVersionsPerTrigger", "1")
      .load(table)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val ks = df.select("k").collect().map(_.getString(0))
        seen.synchronized { seen ++= ks }
        ()
      }.start()

    // consume to v2, stop — the consumer now lags
    val q = start(s"$dir/ckpt")
    try { q.processAllAvailable(); assert(seen.size == 60) }
    finally q.stop()

    // 9 more appends reach v11; the v10 commit wrote a log checkpoint,
    // so expireLog sweeps commits 0..9 — the lagging consumer's next
    // range (2, 11] is no longer reproducible
    (3 until 12).foreach(i => TxTable.append(spark, batch(i), table))
    assert(TxTable.expireLog(spark, table).nonEmpty,
      "expireLog must sweep below the newest checkpoint")

    // the restart fails during the engine's recovery replay of the last
    // committed range — conservative (Delta draws the same boundary:
    // the checkpointed offset's log entries must still exist), and the
    // error still names the table, a swept commit range, and the knob
    val q2 = start(s"$dir/ckpt")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    val msg = ex.getCause.getMessage
    assert(msg.contains(table) && msg.contains("commit range (") &&
      msg.contains("expireLog"),
      s"lag-past-retention error must name table, range, and knob: $msg")

    // a FRESH stream cannot replay the swept history commit-by-commit:
    // batch 0 is the INITIAL SNAPSHOT at the head (all 240 rows), even
    // under maxVersionsPerTrigger=1
    seen.clear()
    val q3 = start(s"$dir/ckpt_fresh")
    try {
      q3.processAllAvailable()
      assert(seen.size == 240 && seen.distinct.size == 240,
        s"fresh stream must snapshot the full table (${seen.size})")
    } finally q3.stop()
    val live = TxTable.read(spark, table).select("k").collect()
      .map(_.getString(0)).toSet
    assert(seen.toSet == live)
  }

  test("a consumer lagging past the vacuum retention fails actionably " +
      "instead of planning reclaimed files") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamvac").toString
    val table = s"$dir/t"
    TxTable.append(spark, batch(0), table)

    val seen = new java.util.concurrent.atomic.AtomicInteger
    def start() = spark.readStream.format("graft")
      .option("skipChangeCommits", "true")
      .load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        seen.addAndGet(df.count().toInt); ()
      }.start()

    val q = start()
    try { q.processAllAvailable(); assert(seen.get == 20) }
    finally q.stop()

    // while the consumer is down: an append (v1), then a delete (v2)
    // that rewrites v1's files, then an aggressive vacuum reclaiming
    // them — the consumer's next range (0, 2] references files that no
    // longer exist, and skipChangeCommits must NOT paper over that
    TxTable.append(spark, batch(1), table)
    assert(TxTable.delete(spark, table, col("k") === "b1_0") >= 0)
    assert(TxTable.vacuum(spark, table, minAgeMs = 0L).nonEmpty,
      "vacuum must reclaim the rewritten files")

    val q2 = start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    val msg = ex.getCause.getMessage
    assert(msg.contains(table) && msg.contains("vacuum") &&
      msg.contains("retention"),
      s"vacuumed-range error must name table and retention knob: $msg")
  }

  test("maxFilesPerTrigger chunks the initial snapshot into bounded " +
      "micro-batches; a mid-snapshot restart resumes exactly-once; the " +
      "tail still arrives after the snapshot drains") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamchunk").toString
    val table = s"$dir/t"
    // a history that does NOT replay cleanly (delete = destructive),
    // so a fresh stream must take the initial-snapshot path; batches
    // land on three dates -> multiple files
    (0 until 3).foreach(i => TxTable.append(spark, batch(i), table))
    assert(TxTable.delete(spark, table, col("k") === "b0_0") >= 0)
    val nFiles = TxTable.liveFiles(spark, table).size
    assert(nFiles >= 3, s"need several live files, got $nFiles")

    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val batches = new java.util.concurrent.atomic.AtomicInteger
    def start(crashAfterFirst: Boolean, ckpt: String = s"$dir/ckpt",
        once: Boolean = false) = {
      val w = spark.readStream.format("graft")
        .option("maxFilesPerTrigger", "1")
        .load(table)
        .writeStream
        .option("checkpointLocation", ckpt)
      (if (once) w.trigger(org.apache.spark.sql.streaming.Trigger.Once())
       else w)
        .foreachBatch { (df: DataFrame, _: Long) =>
          val ks = df.select("k").collect().map(_.getString(0))
          val n = seen.synchronized {
            seen ++= ks
            if (ks.nonEmpty) batches.incrementAndGet() else batches.get
          }
          if (crashAfterFirst && n >= 1)
            throw new RuntimeException("simulated crash mid-snapshot")
          ()
        }.start()
    }

    // the first chunk is delivered, then the query CRASHES before the
    // batch commits — a mid-snapshot failure
    val q1 = start(crashAfterFirst = true)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q1.processAllAvailable() finally q1.stop()
    }
    assert(seen.nonEmpty && seen.size < 59,
      s"the crash must land mid-snapshot (${seen.size})")

    // restart from the same checkpoint: the uncommitted chunk replays,
    // the remaining chunks drain — every live row exactly once in the
    // restarted run
    seen.clear(); batches.set(0)
    val q2 = start(crashAfterFirst = false)
    try {
      q2.processAllAvailable()
      assert(seen.size == 59 && seen.distinct.size == 59,
        s"mid-snapshot restart must resume exactly-once (${seen.size})")
      assert(batches.get >= nFiles,
        s"snapshot must arrive in >= $nFiles chunks (${batches.get})")
      // the tail: a live append after the snapshot drained
      TxTable.append(spark, batch(3), table)
      q2.processAllAvailable()
      assert(seen.size == 79, "tail append must arrive after snapshot")
      assert(seen.count(_.startsWith("b3_")) == 20)
    } finally q2.stop()
    val live = TxTable.read(spark, table).select("k").collect()
      .map(_.getString(0)).toSet
    assert(seen.toSet == live, "streamed set must equal live set")

    // Trigger.Once contract: ReadLimit.allAvailable overrides the rate
    // limit — the whole snapshot lands as ONE batch (the reason
    // AvailableNow exists for limit-respecting drains)
    seen.clear(); batches.set(0)
    val q3 = start(crashAfterFirst = false, ckpt = s"$dir/ckpt_once",
      once = true)
    try assert(q3.awaitTermination(120000), "Trigger.Once must self-stop")
    finally q3.stop()
    assert(batches.get == 1 && seen.size == 79,
      s"Trigger.Once must drain everything in one batch " +
        s"(${batches.get} batches, ${seen.size} rows)")
  }

  test("a paused mid-snapshot consumer whose snapshot version was swept " +
      "by expireLog fails loudly instead of silently truncating the " +
      "backfill") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamsnapexp").toString
    val table = s"$dir/t"
    (0 until 3).foreach(i => TxTable.append(spark, batch(i), table))
    assert(TxTable.delete(spark, table, col("k") === "b0_0") >= 0) // v3

    val got = new java.util.concurrent.atomic.AtomicInteger
    def start() = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1")
      .load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        if (got.addAndGet(df.count().toInt) > 0)
          throw new RuntimeException("pause mid-snapshot")
        ()
      }.start()

    // first chunk lands, then the consumer "pauses" (crashes)
    val q1 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q1.processAllAvailable() finally q1.stop()
    }
    assert(got.get > 0 && got.get < 59)

    // while paused: enough commits for a log checkpoint, then
    // expireLog sweeps the snapshot version's commits
    (4 until 14).foreach(i => TxTable.append(spark, batch(i), table))
    assert(TxTable.expireLog(spark, table).nonEmpty)

    // the resumed snapshot must FAIL actionably — replaying version 3
    // would silently produce an EMPTY file list otherwise
    val q2 = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1")
      .load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (_: DataFrame, _: Long) => () }
      .start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    val msg = ex.getCause.getMessage
    assert(msg.contains(table) && msg.contains("reproducible") &&
      msg.contains("expireLog"),
      s"swept-snapshot error must name table and knob: $msg")
  }

  test("frozen schema mid-stream, evolution visible on restart, and " +
      "NULL backfill for pre-evolution rows") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamevo").toString
    val table = s"$dir/t"
    TxTable.append(spark, batch(0), table)

    def batch4(i: Int): DataFrame =
      (0 until 20).map(j =>
        (java.sql.Date.valueOf("2024-06-02"), s"e${i}_$j",
          (i * 100 + j).toLong, s"tag$i"))
        .toDF("date", "k", "v", "tag")

    val schemas = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val rows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    def start() = spark.readStream.format("graft")
      .load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rs = df.collect()
        schemas.synchronized {
          if (rs.nonEmpty) { schemas += df.columns.toSeq; rows ++= rs }
        }
        ()
      }.start()

    // stream 1: sees the 3-column era; an ADDITIVE evolution lands
    // mid-stream and its rows arrive in the FROZEN (3-column) shape
    val q = start()
    try {
      q.processAllAvailable()
      TxTable.append(spark, batch4(1), table) // evolves schema with tag
      q.processAllAvailable()
      assert(rows.size == 40)
      assert(schemas.forall(_ == Seq("k", "v", "date")),
        s"running stream must keep the frozen columns: $schemas")
    } finally q.stop()

    // restart from the same checkpoint: the new era's schema applies;
    // a post-restart append delivers tag
    schemas.clear(); rows.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      TxTable.append(spark, batch4(2), table)
      q2.processAllAvailable()
      assert(schemas.forall(_ == Seq("k", "v", "tag", "date")),
        s"restart must surface the evolved schema: $schemas")
      assert(rows.forall(_.getAs[String]("tag") == "tag2"))
    } finally q2.stop()

    // a FRESH stream replays the full history under the evolved
    // schema: pre-evolution rows read tag as NULL
    schemas.clear(); rows.clear()
    val q3 = start()
    val q3b = spark.readStream.format("graft").load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt_fresh")
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rs = df.collect()
        schemas.synchronized { rows ++= rs }
        ()
      }.start()
    q3.stop() // only q3b (fresh checkpoint) matters here
    try {
      q3b.processAllAvailable()
      assert(rows.size == 60, s"fresh stream must backfill all (${rows.size})")
      val byTag = rows.groupBy(r => Option(r.getAs[String]("tag")))
      assert(byTag.getOrElse(None, Seq.empty).size == 20,
        "pre-evolution rows must read the new column as NULL")
      assert(byTag.getOrElse(Some("tag1"), Seq.empty).size == 20)
      assert(byTag.getOrElse(Some("tag2"), Seq.empty).size == 20)
    } finally q3b.stop()
  }

  test("Trigger.AvailableNow drains the backfill rate-limited and " +
      "stops; a later run picks up only what landed since") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamavnow").toString
    val table = s"$dir/t"
    (0 until 3).foreach(i => TxTable.append(spark, batch(i), table))

    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val nonEmpty = new java.util.concurrent.atomic.AtomicInteger
    def drain() = {
      val q = spark.readStream.format("graft")
        .option("maxVersionsPerTrigger", "1")
        .load(table)
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, _: Long) =>
          val ks = df.select("k").collect().map(_.getString(0))
          seen.synchronized {
            seen ++= ks
            if (ks.nonEmpty) nonEmpty.incrementAndGet()
          }
          ()
        }.start()
      assert(q.awaitTermination(120000), "AvailableNow must self-stop")
    }
    drain()
    assert(seen.size == 60 && seen.distinct.size == 60,
      s"AvailableNow must drain the full backfill (${seen.size})")
    assert(nonEmpty.get == 3,
      s"rate limit must still chunk the drain (${nonEmpty.get})")
    // landed while no query runs; the next AvailableNow run delivers
    // exactly the delta
    TxTable.append(spark, batch(3), table)
    drain()
    assert(seen.size == 80 && seen.distinct.size == 80,
      s"second run must deliver only the new commit (${seen.size})")
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

  test("change-feed stream: rewrites arrive as delete/insert rows " +
      "instead of failing, a crash mid-feed replays exactly-once, and " +
      "an expired history backfills as a snapshot of inserts") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamcdf").toString
    val table = s"$dir/t"
    import spark.implicits._
    def rows(kv: (String, Long)*) = kv.toSeq.map { case (k, v) =>
      (java.sql.Date.valueOf("2024-06-01"), k, v) }.toDF("date", "k", "v")
    TxTable.append(spark, rows("a" -> 1L, "b" -> 2L), table) // v0
    TxTable.append(spark, rows("c" -> 3L), table)            // v1

    val seen = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    val crashing = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start(ckpt: String = s"$dir/ckpt") = spark.readStream
      .format("graft")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1")
      .load(table)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val got = df.select("_commit_version", "_change_type", "k", "v")
          .collect().map(r => (r.getLong(0), r.getString(1),
            r.getString(2), r.getLong(3)))
        seen.synchronized { seen ++= got }
        if (crashing.get && got.nonEmpty)
          throw new RuntimeException("simulated crash mid-feed")
        ()
      }.start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(seen.toSet == Set((0L, "insert", "a", 1L),
      (0L, "insert", "b", 2L), (1L, "insert", "c", 3L)), seen.toSet)

    // an UPDATE lands while the consumer is down; the restarted feed
    // crashes on its first delivered batch, then a second restart
    // replays it exactly-once
    assert(TxTable.merge(spark, rows("a" -> 10L), table,
      Seq("date", "k")) == 2L)
    seen.clear(); crashing.set(true)
    val q2 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    seen.clear(); crashing.set(false)
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(seen.toSet == Set((2L, "delete", "a", 1L),
      (2L, "insert", "a", 10L)),
      s"the uncommitted change batch must replay exactly-once: $seen")

    // a FRESH consumer on a history whose commits were partly expired
    // gets the snapshot-as-inserts backfill (tagged at the head
    // version), then live tailing continues
    (3 until 13).foreach(i =>
      TxTable.append(spark, rows(s"x$i" -> i.toLong), table))
    assert(TxTable.expireLog(spark, table).nonEmpty)
    seen.clear()
    val q4 = start(ckpt = s"$dir/ckpt_fresh")
    try {
      q4.processAllAvailable()
      val head = TxTable.currentVersion(spark, table)
      assert(seen.nonEmpty && seen.forall(r =>
        r._1 == head && r._2 == "insert"),
        s"expired history must backfill as snapshot inserts: $seen")
      assert(seen.size == TxTable.read(spark, table).count(),
        "the snapshot must cover the whole live table")
      TxTable.append(spark, rows("tail" -> 99L), table)
      q4.processAllAvailable()
      assert(seen.exists(r => r._3 == "tail" && r._2 == "insert"),
        "live tailing must continue after the snapshot")
    } finally q4.stop()
  }

  test("restart AT the snapshot-complete boundary survives expireLog " +
      "sweeping the snapshot version's commits: completion is encoded " +
      "in the terminal offset, so tailing resumes without the file " +
      "list and without a re-backfill") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamdone").toString
    val table = s"$dir/t"
    // destructive history -> snapshot mode, with the snapshot version
    // placed at CheckpointEvery - 1 (v9): the NEXT append rolls a log
    // checkpoint at v10 and expireLog then sweeps 0..9 — exactly the
    // snapshot's commits — while the tail (9, head] stays fully
    // present. Head stays AT the snapshot version for the first run so
    // the stream parks on the snapshot-complete boundary.
    (0 until 9).foreach(i => TxTable.append(spark, batch(i), table))
    assert(TxTable.delete(spark, table, col("k") === "b0_0") >= 0) // v9

    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def start() = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", "1")
      .load(table)
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (df: DataFrame, _: Long) =>
        val ks = df.select("k").collect().map(_.getString(0))
        seen.synchronized { seen ++= ks }
        ()
      }.start()

    // drain the whole snapshot, then stop cleanly at the boundary
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(seen.size == 179, s"snapshot must drain fully (${seen.size})")

    // while down: appends roll the v10 log checkpoint and expireLog
    // sweeps the snapshot version's commits (0..9) — the snapshot at
    // v9 is no longer REPRODUCIBLE, but per-commit tailing past it
    // still is, and the restart must take it (pre-round-9, the final
    // chunk offset forced snapFiles(9) and failed here)
    (10 until 13).foreach(i => TxTable.append(spark, batch(i), table))
    val swept = TxTable.expireLog(spark, table)
    assert(swept.exists(_ >= 9L),
      s"the snapshot version's commits must be swept, got $swept")

    seen.clear()
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(seen.size == 60 && seen.forall(k =>
      (10 until 13).exists(i => k.startsWith(s"b${i}_"))),
      s"restart must tail exactly the offline appends, no re-backfill " +
        s"and no failure (${seen.size})")
  }

  test("a rewrite commit landing BETWEEN snapshot chunks: the frozen " +
      "snapshot still delivers the as-of state, then the tail fails " +
      "loudly on the rewrite without skipChangeCommits and skips it " +
      "transparently with it") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streammidrw").toString
    val table = s"$dir/t"
    (0 until 3).foreach(i => TxTable.append(spark, batch(i), table))
    assert(TxTable.delete(spark, table, col("k") === "b0_0") >= 0) // v3
    val asOfRows = TxTable.read(spark, table).count() // 59

    def run(skip: Boolean, ckpt: String): (Long, Option[String]) = {
      val rewrote = new java.util.concurrent.atomic.AtomicBoolean
      val n = new java.util.concurrent.atomic.AtomicLong
      val w = spark.readStream.format("graft")
      val w2 = (if (skip) w.option("skipChangeCommits", "true") else w)
        .option("maxFilesPerTrigger", "1")
        .load(table)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          n.addAndGet(df.count())
          // the FIRST chunk triggers a concurrent rewrite: a delete
          // lands between snapshot chunks (plus one live append so the
          // tail has something to deliver)
          if (rewrote.compareAndSet(false, true)) {
            TxTable.delete(spark, table, col("k") === "b1_0")
            TxTable.append(spark, batch(7), table)
          }
          ()
        }.start()
      val err = try { w2.processAllAvailable(); None }
        catch { case e: org.apache.spark.sql.streaming
            .StreamingQueryException =>
          Some(e.getCause.getMessage) }
        finally w2.stop()
      (n.get(), err)
    }

    // arm 1: no skipChangeCommits — the snapshot itself completes with
    // the frozen as-of-v3 state (59 rows), then the tail range hits
    // the mid-snapshot delete and fails actionably
    val (n1, err1) = run(skip = false, s"$dir/ckpt1")
    assert(err1.isDefined, "tailing into a rewrite must fail loudly")
    assert(err1.get.contains("skipChangeCommits") &&
      err1.get.contains(table),
      s"error must name the table and the knob: ${err1.get}")
    assert(n1 >= asOfRows,
      s"the frozen snapshot must deliver the full as-of state before " +
        s"the tail fails ($n1 < $asOfRows)")

    // arm 2 (fresh checkpoint; the table now has v3-delete history
    // PLUS the arm-1 rewrite+append): skipChangeCommits skips the
    // rewrite commit, the snapshot + live append flow through
    val before = TxTable.read(spark, table).count()
    val (n2, err2) = run(skip = true, s"$dir/ckpt2")
    assert(err2.isEmpty, s"skipChangeCommits arm must not fail: $err2")
    // the second arm's own mid-snapshot rewrite deletes an already-
    // delivered row and appends batch(7) again: snapshot(as of start)
    // + the live append
    assert(n2 == before + 20,
      s"snapshot + tail append must flow through ($n2 vs $before + 20)")
  }

  test("maxFilesPerTrigger changed across a mid-snapshot restart: old " +
      "offsets decode, chunks resize, delivery stays exactly-once") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_streamresize").toString
    val table = s"$dir/t"
    (0 until 3).foreach(i => TxTable.append(spark, batch(i), table))
    assert(TxTable.delete(spark, table, col("k") === "b0_0") >= 0)
    val nFiles = TxTable.liveFiles(spark, table).size
    assert(nFiles >= 3)

    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def start(mft: Option[Int], crash: Boolean) = {
      val r = spark.readStream.format("graft")
      mft.foreach(n => r.option("maxFilesPerTrigger", n.toString))
      r.load(table)
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (df: DataFrame, _: Long) =>
          val ks = df.select("k").collect().map(_.getString(0))
          val total = seen.synchronized { seen ++= ks; seen.size }
          if (crash && total >= 1)
            throw new RuntimeException("simulated crash mid-snapshot")
          ()
        }.start()
    }

    // crash after the first 1-file chunk
    val q1 = start(Some(1), crash = true)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q1.processAllAvailable() finally q1.stop()
    }
    assert(seen.nonEmpty && seen.size < 59)

    // restart with a BIGGER chunk size: the committed s:v:idx offset
    // decodes, the remaining files drain in resized chunks
    seen.clear()
    val q2 = start(Some(3), crash = false)
    try q2.processAllAvailable() finally q2.stop()
    assert(seen.size == 59 && seen.distinct.size == 59,
      s"resized restart must stay exactly-once (${seen.size})")

    // and a post-snapshot restart with NO maxFilesPerTrigger still
    // decodes the terminal offset and tails new appends
    seen.clear()
    TxTable.append(spark, batch(5), table)
    val q3 = start(None, crash = false)
    try q3.processAllAvailable() finally q3.stop()
    assert(seen.size == 20 && seen.forall(_.startsWith("b5_")),
      s"unlimited restart must tail the new append only (${seen.size})")
  }
}
