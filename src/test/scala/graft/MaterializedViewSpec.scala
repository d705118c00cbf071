package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sink.{MaterializedView => MV, TxTable}

/** Incremental MV maintenance: each base append folds into per-group
  * partial states exactly once; rewrite commits never re-trigger; state
  * compaction and read-time -Merge finalization preserve the answer.
  */
class MaterializedViewSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_mv").toString

  /** Deterministic fact rows [lo, hi): 3 dates × 5 string keys, v = id. */
  private def batch(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(
      to_date(concat(lit("2024-01-0"), (col("id") % 3 + 1))).as("date"),
      (col("id") % 5).cast("string").as("k"),
      col("id").as("v"))

  private val mvDef = MV.MvDef(
    Seq("date", "k"),
    Seq(MV.SumState("v", "v_sum"), MV.CountState("n"),
      MV.MinState("v", "v_min"), MV.MaxState("v", "v_max"),
      MV.AvgState("v", "v_avg")))

  private def expected(rows: DataFrame): Seq[Row] =
    rows.groupBy("date", "k").agg(
      sum("v").as("v_sum"), count(lit(1)).as("n"),
      min("v").as("v_min"), max("v").as("v_max"),
      (sum("v").cast("double") / count(lit(1))).as("v_avg"))
      .orderBy("date", "k").collect().toSeq

  private def got(mvT: String): Seq[Row] =
    MV.read(spark, mvT, mvDef).orderBy("date", "k").collect().toSeq

  test("MV: three deltas fold incrementally to the one-pass answer; " +
      "duplicate refresh and mark-only commits no-op") {
    val dir = tmp()
    val (baseT, mvT) = (s"$dir/base", s"$dir/mv")
    (0 until 3).foreach { i =>
      TxTable.append(spark, batch(i * 400, (i + 1) * 400), baseT)
      assert(MV.refresh(spark, baseT, mvT, mvDef) >= 0,
        s"refresh $i applies its delta")
    }
    assert(got(mvT) == expected(batch(0, 1200)))
    assert(MV.lastApplied(spark, mvT) == TxTable.currentVersion(spark, baseT))
    // up to date → no-op
    assert(MV.refresh(spark, baseT, mvT, mvDef) == -1L)
    // a data-less base commit (another writer's txn mark) advances the
    // MV's high-water mark without touching MV data
    val before = TxTable.liveFiles(spark, mvT).size
    TxTable.commitTxnMark(spark, baseT, "other-writer", 7L)
    assert(MV.refresh(spark, baseT, mvT, mvDef) >= 0, "mark-only advance")
    assert(TxTable.liveFiles(spark, mvT).size == before, "no data written")
    assert(MV.refresh(spark, baseT, mvT, mvDef) == -1L)
    assert(got(mvT) == expected(batch(0, 1200)))
  }

  test("MV populates on insert (the ClickHouse contract): streaming " +
      "ingest pushes each micro-batch through appendTxn + refresh, the " +
      "MV is current after EVERY batch, and replays stay no-ops") {
    val dir = tmp()
    val (baseT, mvT) = (s"$dir/base", s"$dir/mv")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    val rows = mem.toDF().select(
      to_date(concat(lit("2024-01-0"), (col("value") % 3 + 1))).as("date"),
      (col("value") % 5).cast("string").as("k"),
      col("value").as("v"))
    val q = rows.writeStream
      .option("checkpointLocation", s"$dir/cp")
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (TxTable.appendTxn(spark, b, baseT, "mv-stream", id) >= 0)
          require(MV.refresh(spark, baseT, mvT, mvDef) >= 0,
            s"on-insert refresh of batch $id must apply")
        // the contract under test: after every landed batch the MV
        // covers the base, so projection routing never lags the stream
        require(MV.isCurrent(spark, baseT, mvT), s"MV lags after batch $id")
        ()
      }.start()
    try {
      mem.addData(0L until 400L: _*)
      q.processAllAvailable()
      mem.addData(400L until 800L: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got(mvT) == expected(batch(0, 800)))
    // a zombie replay of batch 0: the txn mark swallows the append and
    // the MV sees nothing new
    assert(TxTable.appendTxn(spark, batch(0, 400), baseT, "mv-stream", 0L)
      == -1L)
    assert(MV.refresh(spark, baseT, mvT, mvDef) == -1L)
    assert(got(mvT) == expected(batch(0, 800)))
  }

  test("MV: a base rewrite commit (merge re-statement) is not re-applied") {
    val dir = tmp()
    val (baseT, mvT) = (s"$dir/base", s"$dir/mv")
    TxTable.append(spark, batch(0, 300), baseT)
    assert(MV.refresh(spark, baseT, mvT, mvDef) >= 0)
    // re-state 100 existing rows UNCHANGED via merge: a remove+add
    // rewrite commit whose content is identical — ClickHouse mutations /
    // background merges do not flow through MVs, and re-applying the
    // rewritten files here would double-count them
    TxTable.merge(spark, batch(100, 200), baseT, Seq("date", "k", "v"))
    TxTable.append(spark, batch(300, 600), baseT)
    assert(MV.refresh(spark, baseT, mvT, mvDef) >= 0)
    assert(got(mvT) == expected(batch(0, 600)),
      "rewritten files skipped, appended files applied once")
  }

  test("MV: compact collapses partials state-preservingly; refresh and " +
      "the answer survive it") {
    val dir = tmp()
    val (baseT, mvT) = (s"$dir/base", s"$dir/mv")
    (0 until 3).foreach { i =>
      TxTable.append(spark, batch(i * 500, (i + 1) * 500), baseT)
      MV.refresh(spark, baseT, mvT, mvDef)
    }
    val filesBefore = TxTable.liveFiles(spark, mvT).size
    MV.compact(spark, mvT, mvDef)
    assert(TxTable.liveFiles(spark, mvT).size < filesBefore,
      "partial batches collapsed")
    assert(got(mvT) == expected(batch(0, 1500)), "answer preserved")
    // avg partial must be the (sum, cnt) pair, still mergeable
    val cols = TxTable.read(spark, mvT).columns
    assert(cols.contains("v_avg_sum") && cols.contains("v_avg_cnt"))
    // the high-water mark rides the log across the overwrite
    TxTable.append(spark, batch(1500, 1800), baseT)
    assert(MV.refresh(spark, baseT, mvT, mvDef) >= 0)
    assert(got(mvT) == expected(batch(0, 1800)))
  }

  test("MV: mark advance is compare-and-set — a refresher whose delta " +
      "basis went stale loses with -1 instead of double-applying the " +
      "overlap") {
    val dir = tmp()
    val (baseT, mvT) = (s"$dir/base", s"$dir/mv")
    TxTable.append(spark, batch(0, 100), baseT)   // base v0
    TxTable.append(spark, batch(100, 200), baseT) // base v1
    // refresher A read mark=-1 and base head v0; its work: partial of
    // v0's rows, CAS from -1
    val partialA = mvDef.partial(batch(0, 100))
    // refresher B ALSO read mark=-1 but base head v1; its overlapping
    // work: partial of v0+v1's rows, CAS from -1
    val partialB = mvDef.partial(batch(0, 200))
    assert(TxTable.appendTxn(spark, partialA, mvT, MV.WriterApp, 0L,
      expectMark = Some(-1L)) >= 0, "first advance from -1 wins")
    // B's version (1) clears the >=-dup check — ONLY the CAS stops it
    assert(TxTable.appendTxn(spark, partialB, mvT, MV.WriterApp, 1L,
      expectMark = Some(-1L)) == -1L,
      "stale-basis advance must lose the CAS")
    assert(got(mvT) == expected(batch(0, 100)),
      "no double-applied overlap")
    // the losing refresher's NEXT cycle reads mark=0 and applies v1
    assert(MV.refresh(spark, baseT, mvT, mvDef) >= 0)
    assert(got(mvT) == expected(batch(0, 200)))
  }

  test("MV: a destructive base commit triggers a full REBUILD — the MV " +
      "serves post-delete truth, and a first refresh over a base with " +
      "rewrite history covers the rewritten files") {
    val dir = tmp()
    val (baseT, mvT) = (s"$dir/base", s"$dir/mv")
    TxTable.append(spark, batch(0, 300), baseT)
    // delete BEFORE the MV's first refresh: the incremental feed skips
    // nothing-but-append ranges only — a naive appendedIn replay would
    // re-read the ORIGINAL append's files (still on disk, unvacuumed)
    // and resurrect the deleted rows
    assert(TxTable.delete(spark, baseT, col("v") >= 150L) >= 0)
    assert(MV.refresh(spark, baseT, mvT, mvDef) >= 0,
      "first refresh over destructive history rebuilds")
    assert(got(mvT) == expected(batch(0, 150)),
      "rebuilt MV excludes deleted rows")
    assert(MV.isCurrent(spark, baseT, mvT))
    assert(MV.refresh(spark, baseT, mvT, mvDef) == -1L, "rebuild no-ops")
    // now go stale via a delete AFTER the MV exists
    assert(TxTable.delete(spark, baseT, col("v") >= 100L) >= 0)
    assert(!MV.isCurrent(spark, baseT, mvT),
      "post-refresh delete must read as staleness")
    assert(MV.refresh(spark, baseT, mvT, mvDef) >= 0)
    assert(got(mvT) == expected(batch(0, 100)))
    assert(MV.isCurrent(spark, baseT, mvT))
    // incremental appends keep working after a rebuild
    TxTable.append(spark, batch(300, 400), baseT)
    assert(MV.refresh(spark, baseT, mvT, mvDef) >= 0)
    assert(got(mvT) ==
      expected(batch(0, 100).unionByName(batch(300, 400))))
  }

  test("MV: TWO different views over ONE base refresh on independent " +
      "cadences — marks never cross-contaminate, compacting one never " +
      "perturbs the other, and a destructive base commit rebuilds " +
      "each independently to the same post-delete truth") {
    val dir = tmp()
    val (baseT, mvA, mvB) = (s"$dir/base", s"$dir/mva", s"$dir/mvb")
    val defA = mvDef // (date, k) with the full state set
    val defB = MV.MvDef(Seq("date"),
      Seq(MV.SumState("v", "v_sum"), MV.MaxState("v", "v_max")))
    TxTable.append(spark, batch(0, 100), baseT) // v0
    assert(MV.refresh(spark, baseT, mvA, defA) >= 0)
    TxTable.append(spark, batch(100, 200), baseT) // v1
    assert(MV.refresh(spark, baseT, mvB, defB) >= 0,
      "B's FIRST refresh covers both commits in one delta")
    assert(MV.lastApplied(spark, mvA) == 0L &&
      MV.lastApplied(spark, mvB) == 1L,
      "each MV's high-water mark lives in its own log")
    assert(!MV.isCurrent(spark, baseT, mvA) &&
      MV.isCurrent(spark, baseT, mvB))
    // compacting B must not touch A's mark or content
    val aBefore = got(mvA)
    MV.compact(spark, mvB, defB)
    assert(MV.lastApplied(spark, mvA) == 0L && got(mvA) == aBefore)
    assert(MV.refresh(spark, baseT, mvA, defA) >= 0)
    assert(got(mvA) == expected(batch(0, 200)))
    // destructive commit: BOTH go stale, each rebuilds independently
    assert(TxTable.delete(spark, baseT, col("v") >= 150L) >= 0)
    assert(!MV.isCurrent(spark, baseT, mvA) &&
      !MV.isCurrent(spark, baseT, mvB))
    assert(MV.refresh(spark, baseT, mvA, defA) >= 0)
    // A is current again; B is STILL stale until its own refresh runs
    assert(MV.isCurrent(spark, baseT, mvA) &&
      !MV.isCurrent(spark, baseT, mvB),
      "A's rebuild must not advance B's mark")
    assert(MV.refresh(spark, baseT, mvB, defB) >= 0)
    assert(got(mvA) == expected(batch(0, 150)))
    def shape(r: Row) = (r.getAs[java.sql.Date]("date").toString,
      r.getAs[Long]("v_sum"), r.getAs[Long]("v_max"))
    val bFinal = MV.read(spark, mvB, defB).orderBy("date").collect()
      .map(shape).toSeq
    val bWant = batch(0, 150).groupBy("date")
      .agg(sum("v").as("v_sum"), max("v").as("v_max")).orderBy("date")
      .collect().map(shape).toSeq
    assert(bFinal == bWant, "B rebuilds to its own post-delete truth")
  }

  test("MV: RETRACTABLE states apply a destructive base commit as " +
      "negative partials (O(touched files), no rebuild), fully-" +
      "retracted groups vanish from reads, the projection route " +
      "refuses the tombstoned MV, and compact collapses tombstones " +
      "and re-enables it") {
    val dir = tmp()
    val (baseT, mvT) = (s"$dir/base", s"$dir/mv")
    val defR = MV.MvDef(Seq("date", "k"),
      Seq(MV.SumState("v", "v_sum"), MV.CountState("n"),
        MV.AvgState("v", "v_avg")))
    TxTable.append(spark, batch(0, 300), baseT)
    assert(MV.refresh(spark, baseT, mvT, defR) >= 0)
    // destructive commit: delete the top half
    assert(TxTable.delete(spark, baseT, col("v") >= 150L) >= 0)
    assert(MV.refresh(spark, baseT, mvT, defR) >= 0)
    // the refresh APPENDED a retraction batch — never overwrote
    val ops = TxTable.history(spark, mvT)
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(!ops.contains("overwrite") && ops.count(_ == "append") >= 2,
      s"retract refresh must append, not rebuild: $ops")
    assert(TxTable.tableProperties(spark, mvT)
      .contains(MV.TombstoneProp))
    // served values equal the from-scratch truth
    def got2() = MV.read(spark, mvT, defR).orderBy("date", "k")
      .collect().map(r => (r.getAs[String]("k"),
        r.getAs[Long]("v_sum"), r.getAs[Long]("n"))).toSeq
    def want(rows: DataFrame) = rows.groupBy("date", "k")
      .agg(sum("v").as("v_sum"), count(lit(1)).as("n"))
      .orderBy("date", "k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("v_sum"),
        r.getAs[Long]("n"))).toSeq
    assert(got2() == want(batch(0, 150)))
    assert(MV.isCurrent(spark, baseT, mvT))
    // fully retract ONE group: k="4" rows among v<150 are v%5==4 ->
    // delete every remaining row of that k
    assert(TxTable.delete(spark, baseT, col("k") === "4") >= 0)
    assert(MV.refresh(spark, baseT, mvT, defR) >= 0)
    assert(got2() == want(batch(0, 150).filter(col("k") =!= "4")),
      "a fully-retracted group must vanish from reads")
    assert(!got2().exists(_._1 == "4"))
    // the projection route refuses the tombstoned MV...
    graft.plans.Projections.register(spark, baseT, mvT, defR)
    try {
      // build the query FRESH for each probe: QueryExecution caches
      // the optimized plan on first access
      def scansOf(): Seq[String] = graft.sink.TxFileIndex
        .readV2(spark, baseT).groupBy("k").agg(sum("v").as("v_sum"))
        .queryExecution.optimizedPlan.collect {
          case l: org.apache.spark.sql.execution.datasources
              .LogicalRelation => l.relation match {
            case h: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation => h.location.inputFiles.toSeq
            case _ => Seq.empty[String]
          }
        }.flatten
      val scans = scansOf()
      assert(scans.nonEmpty && !scans.exists(_.contains("/mv/")),
        "a tombstoned MV must not serve the projection route")
      // ...until compact collapses the tombstones and clears the mark
      MV.compact(spark, mvT, defR)
      assert(!TxTable.tableProperties(spark, mvT)
        .contains(MV.TombstoneProp))
      assert(got2() == want(batch(0, 150).filter(col("k") =!= "4")))
      val scans2 = scansOf()
      assert(scans2.nonEmpty && scans2.forall(_.contains("/mv/")),
        "after compact the projection route must serve from the MV")
    } finally graft.plans.Projections.deregister(spark, baseT)
  }

  test("MV: a MERGE-ON-READ delete (deletion vector) retracts like a " +
      "rewrite delete — negative partials from the feed's vector " +
      "diff, no rebuild, and a follow-up purge needs no refresh") {
    val dir = tmp()
    val (baseT, mvT) = (s"$dir/base", s"$dir/mv")
    val defR = MV.MvDef(Seq("date", "k"),
      Seq(MV.SumState("v", "v_sum"), MV.CountState("n")))
    TxTable.append(spark, batch(0, 300), baseT)
    assert(MV.refresh(spark, baseT, mvT, defR) >= 0)
    assert(TxTable.deleteMergeOnRead(spark, baseT, col("v") >= 150L) > 0)
    assert(MV.refresh(spark, baseT, mvT, defR) >= 0)
    val ops = TxTable.history(spark, mvT)
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(!ops.contains("overwrite") && ops.count(_ == "append") >= 2,
      s"a vectored delete must retract by appends, not rebuild: $ops")
    def got() = MV.read(spark, mvT, defR).orderBy("date", "k")
      .collect().map(r => (r.getAs[String]("k"),
        r.getAs[Long]("v_sum"), r.getAs[Long]("n"))).toSeq
    def want(rows: DataFrame) = rows.groupBy("date", "k")
      .agg(sum("v").as("v_sum"), count(lit(1)).as("n"))
      .orderBy("date", "k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("v_sum"),
        r.getAs[Long]("n"))).toSeq
    assert(got() == want(batch(0, 150)))
    assert(MV.isCurrent(spark, baseT, mvT))
    // purge is layout-class: the MV stays current with NO refresh
    assert(TxTable.purgeDeletes(spark, baseT) > 0)
    assert(MV.isCurrent(spark, baseT, mvT),
      "a purge must not stale the MV")
    assert(got() == want(batch(0, 150)))
  }

  test("MV: KLL quantile states merge across deltas within the rank-" +
      "error envelope") {
    val dir = tmp()
    val (baseT, mvT) = (s"$dir/base", s"$dir/mv")
    val n = 9000L
    val probes = Seq(0.1, 0.5, 0.9)
    val qDef = MV.MvDef(Seq("date"),
      Seq(MV.QuantileState("v", "q", probes), MV.CountState("n")))
    // v = 0..n-1 exactly once, split across 3 interleaved deltas, so
    // true rank(v) = v + 1
    (0 until 3).foreach { i =>
      TxTable.append(spark,
        spark.range(n).filter(col("id") % 3 === i).select(
          to_date(lit("2024-02-01")).as("date"), col("id").as("v")),
        baseT)
      assert(MV.refresh(spark, baseT, mvT, qDef) >= 0)
    }
    MV.compact(spark, mvT, qDef) // state-to-state sketch combine
    val row = MV.read(spark, mvT, qDef).collect().head
    assert(row.getAs[Long]("n") == n)
    val qs = row.getSeq[Long](row.fieldIndex("q"))
    probes.zip(qs).foreach { case (p, v) =>
      val err = math.abs((v + 1) - p * n)
      assert(err <= 0.02 * n,
        s"quantile p=$p estimated $v, rank error $err > ${0.02 * n}")
    }
  }

  test("MV: the retraction fallback is TYPED — a vacuum-reclaimed feed " +
      "falls back to rebuild; an unrelated require failure PROPAGATES " +
      "instead of silently degrading to rebuilds forever") {
    val defR = MV.MvDef(Seq("date", "k"),
      Seq(MV.SumState("v", "v_sum"), MV.CountState("n")))
    // ---- arm 1: feed-unreproducible → typed exception → rebuild ----
    val d1 = tmp()
    val (b1, m1) = (s"$d1/base", s"$d1/mv")
    TxTable.append(spark, batch(0, 200), b1)
    assert(MV.refresh(spark, b1, m1, defR) >= 0)
    assert(TxTable.delete(spark, b1, col("v") >= 100L) >= 0)
    // reclaim the delete's pre-images NOW — the change feed can no
    // longer reproduce the destructive commit
    assert(TxTable.vacuum(spark, b1, minAgeMs = 0L).nonEmpty)
    intercept[TxTable.ChangeFeedUnavailableException] {
      TxTable.changeFeed(spark, b1, MV.lastApplied(spark, m1),
        TxTable.currentVersion(spark, b1)).collect()
    }
    assert(MV.refresh(spark, b1, m1, defR) >= 0,
      "refresh must fall back to rebuild")
    assert(TxTable.history(spark, m1).select("operation").collect()
      .map(_.getString(0)).contains("overwrite"),
      "the fallback path is a REBUILD (overwrite commit)")
    assert(MV.read(spark, m1, defR).agg(sum("v_sum")).head.getLong(0) ==
      batch(0, 100).agg(sum("v")).head.getLong(0))
    // ---- arm 2: an unrelated IllegalArgumentException propagates ----
    val d2 = tmp()
    val (b2, m2) = (s"$d2/base", s"$d2/mv")
    TxTable.append(spark, batch(0, 100), b2)
    assert(MV.refresh(spark, b2, m2, defR) >= 0)
    // sabotage the MV table: replace its schema non-additively (v_sum
    // becomes a string) — the next retraction append's schema check
    // throws a PLAIN IllegalArgumentException
    import spark.implicits._
    val junk = Seq(("2024-01-01", "x", "oops", 1L))
      .toDF("d", "k", "v_sum", "n")
      .select(to_date(col("d")).as("date"), col("k"), col("v_sum"),
        col("n"))
    TxTable.overwrite(spark, junk, m2)
    assert(TxTable.delete(spark, b2, col("v") >= 50L) >= 0)
    val e = intercept[IllegalArgumentException] {
      MV.refresh(spark, b2, m2, defR)
    }
    assert(!e.isInstanceOf[TxTable.ChangeFeedUnavailableException],
      "a genuine bug must NOT be masked as a rebuild")
    assert(e.getMessage.contains("non-additive"))
  }

  test("MV: compact clears the tombstone mark in the SAME commit as " +
      "its overwrite — no window where tombstoned state rows survive " +
      "an already-cleared mark") {
    val dir = tmp()
    val (baseT, mvT) = (s"$dir/base", s"$dir/mv")
    val defR = MV.MvDef(Seq("date", "k"),
      Seq(MV.SumState("v", "v_sum"), MV.CountState("n")))
    TxTable.append(spark, batch(0, 200), baseT)
    assert(MV.refresh(spark, baseT, mvT, defR) >= 0)
    assert(TxTable.delete(spark, baseT, col("k") === "3") >= 0)
    assert(MV.refresh(spark, baseT, mvT, defR) >= 0) // retraction
    assert(TxTable.tableProperties(spark, mvT).contains(MV.TombstoneProp))
    val vBefore = TxTable.currentVersion(spark, mvT)
    MV.compact(spark, mvT, defR)
    assert(TxTable.currentVersion(spark, mvT) == vBefore + 1,
      "compact + mark clear must be ONE commit")
    assert(!TxTable.tableProperties(spark, mvT).contains(MV.TombstoneProp))
    assert(MV.read(spark, mvT, defR).filter(col("k") === "3").count() == 0)
  }
}
