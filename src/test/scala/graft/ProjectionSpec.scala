package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Projections
import graft.sink.{MaterializedView, TxFileIndex, TxTable}
import graft.sink.MaterializedView._

/** ClickHouse-PROJECTION routing: queries written against the BASE tx
  * table are transparently served from its materialized view when the
  * MV covers them and is current — and NEVER otherwise.
  */
class ProjectionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** The files the OPTIMIZED plan reads — the projection rule runs in
    * the optimizer, so routing is visible here (and invisible to
    * `inputFiles`, which walks the pre-optimization analyzed plan; the
    * physical scan additionally hides inside AQE query-stage leaves).
    */
  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => h.location.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten

  private def fixture(): (String, String, MvDef) = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_projspec").toString
    val (baseT, mvT) = (s"$dir/base", s"$dir/mv")
    val mv = MvDef(Seq("date", "event_type"),
      Seq(SumState("cents", "cents"), CountState("n"),
        MinState("cents", "c_min"), MaxState("cents", "c_max"),
        AvgState("cents", "c_avg")))
    def d(s: String) = java.sql.Date.valueOf(s)
    // two appends → two deltas; duplicate groups across deltas so the
    // re-merge is actually exercised
    TxTable.append(spark, Seq(
      (d("2024-03-01"), "view", 10L), (d("2024-03-01"), "view", 30L),
      (d("2024-03-01"), "click", 7L), (d("2024-03-02"), "view", 100L)
    ).toDF("date", "event_type", "cents"), baseT)
    require(MaterializedView.refresh(spark, baseT, mvT, mv) >= 0)
    TxTable.append(spark, Seq(
      (d("2024-03-01"), "view", 2L), (d("2024-03-02"), "click", 11L)
    ).toDF("date", "event_type", "cents"), baseT)
    require(MaterializedView.refresh(spark, baseT, mvT, mv) >= 0)
    Projections.register(spark, baseT, mvT, mv)
    (baseT, mvT, mv)
  }

  test("covered aggregates over the base are served from the MV with " +
    "identical results; uncovered shapes and stale MVs fall back") {
    val (baseT, mvT, mv) = fixture()
    def baseDf = TxFileIndex.readV2(spark, baseT)

    // coarser grouping than the MV keys → partial re-merge
    val routed = baseDf.groupBy("event_type")
      .agg(sum("cents").as("cents"), count(lit(1)).as("n"),
        min("cents").as("c_min"), max("cents").as("c_max"),
        avg("cents").as("c_avg"))
      .orderBy("event_type")
    assert(scannedPaths(routed).nonEmpty &&
      scannedPaths(routed).forall(_.contains("/mv/")),
      "covered query must scan ONLY MV files")
    val rows = routed.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.toSeq == Seq(
      ("click", 18L, 2L, 7L, 11L, 9.0),
      ("view", 142L, 4L, 2L, 100L, 35.5)))

    // group-key filter routes too, and filters the MV rows
    val filtered = baseDf
      .filter(col("date") === lit(java.sql.Date.valueOf("2024-03-01")))
      .groupBy("event_type").agg(sum("cents").as("cents"))
      .orderBy("event_type")
    assert(scannedPaths(filtered).forall(_.contains("/mv/")))
    assert(filtered.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("click", 7L), ("view", 42L)))

    // uncovered: filter on a NON-key column must not route (it would
    // filter pre-aggregated rows — wrong semantics)
    val uncovered = baseDf.filter(col("cents") > 5)
      .groupBy("event_type").agg(sum("cents").as("cents"))
    assert(scannedPaths(uncovered).forall(_.contains("/base/")),
      "non-key filter must fall back to the base scan")

    // uncovered: an aggregate with no matching state
    val noState = baseDf.groupBy("event_type")
      .agg(sum(col("cents") * 2).as("x"))
    assert(scannedPaths(noState).forall(_.contains("/base/")))

    // distinct aggregates never route (states cannot answer them)
    val dist = baseDf.groupBy("event_type")
      .agg(countDistinct(col("cents")).as("x"))
    assert(scannedPaths(dist).forall(_.contains("/base/")))

    // STALENESS: a new base append makes the MV non-current — queries
    // must silently return to the base (fresh rows included), then
    // route again after the next refresh
    TxTable.append(spark, Seq(
      (java.sql.Date.valueOf("2024-03-03"), "view", 1000L)
    ).toDF("date", "event_type", "cents"), baseT)
    val stale = baseDf.groupBy("event_type")
      .agg(sum("cents").as("cents")).orderBy("event_type")
    assert(scannedPaths(stale).forall(_.contains("/base/")),
      "stale MV must not serve the query")
    assert(stale.collect().map(_.getLong(1)).sum == 18L + 142L + 1000L)
    require(MaterializedView.refresh(spark, baseT, mvT, mv) >= 0)
    val again = baseDf.groupBy("event_type")
      .agg(sum("cents").as("cents")).orderBy("event_type")
    assert(scannedPaths(again).forall(_.contains("/mv/")),
      "refresh restores routing")
    assert(again.collect().map(_.getLong(1)).sum == 1160L)

    // a REWRITE base commit (z-order: layout-only remove+add) does not
    // count as staleness — exactly as MV refresh skips rewrite commits
    TxTable.zorder(spark, baseT, Seq("date", "event_type"))
    val afterRewrite = baseDf.groupBy("event_type")
      .agg(sum("cents").as("cents"))
    assert(scannedPaths(afterRewrite).forall(_.contains("/mv/")),
      "rewrite-only base commits keep the MV current")
    assert(afterRewrite.collect().map(_.getLong(1)).sum == 1160L)

    Projections.deregister(spark, baseT)
    val off = baseDf.groupBy("event_type").agg(sum("cents").as("cents"))
    assert(scannedPaths(off).forall(_.contains("/base/")),
      "deregistering disarms the route")
  }

  test("destructive base commits (DELETE) un-route the MV — fallback " +
      "returns the post-delete truth, refresh rebuilds, routing resumes") {
    val (baseT, mvT, mv) = fixture()
    def baseDf = TxFileIndex.readV2(spark, baseT)
    // routed and current before the mutation
    assert(MaterializedView.isCurrent(spark, baseT, mvT))
    // remove one row (the 03-01 click, cents=7): the MV still carries it
    assert(TxTable.delete(spark, baseT, col("cents") === 7L) >= 0)
    assert(!MaterializedView.isCurrent(spark, baseT, mvT),
      "a delete commit MUST read as staleness")
    val q = baseDf.groupBy("event_type").agg(sum("cents").as("cents"))
    assert(scannedPaths(q).forall(_.contains("/base/")),
      "stale-after-delete MV must not serve the query")
    assert(q.collect().map(_.getLong(1)).sum == 160L - 7L)
    // refresh cannot apply a delete incrementally → full rebuild
    assert(MaterializedView.refresh(spark, baseT, mvT, mv) >= 0)
    assert(MaterializedView.isCurrent(spark, baseT, mvT))
    val q2 = baseDf.groupBy("event_type").agg(sum("cents").as("cents"))
    assert(scannedPaths(q2).forall(_.contains("/mv/")),
      "rebuild restores routing")
    assert(q2.collect().map(_.getLong(1)).sum == 160L - 7L,
      "rebuilt MV serves the post-delete truth")
    Projections.deregister(spark, baseT)
  }

  test("a time-travel (versionAsOf) aggregate is NEVER routed to the " +
      "MV — it reads its own era, not present-day partials") {
    val (baseT, mvT, mv) = fixture()
    val v = TxTable.currentVersion(spark, baseT)
    // advance the base AND the MV so the MV is current at a later version
    TxTable.append(spark, Seq(
      (java.sql.Date.valueOf("2024-03-03"), "view", 1000L)
    ).toDF("date", "event_type", "cents"), baseT)
    require(MaterializedView.refresh(spark, baseT, mvT, mv) >= 0)
    assert(MaterializedView.isCurrent(spark, baseT, mvT))
    val hist = spark.read.format("graft").option("versionAsOf", v)
      .load(baseT)
      .groupBy("event_type").agg(sum("cents").as("cents"))
    assert(scannedPaths(hist).nonEmpty &&
      scannedPaths(hist).forall(_.contains("/base/")),
      "historical scan must stay on the base files")
    assert(hist.collect().map(_.getLong(1)).sum == 160L,
      "versionAsOf answer excludes the later append")
    // the present-day query still routes
    val now = TxFileIndex.readV2(spark, baseT)
      .groupBy("event_type").agg(sum("cents").as("cents"))
    assert(scannedPaths(now).forall(_.contains("/mv/")))
    assert(now.collect().map(_.getLong(1)).sum == 1160L)
    Projections.deregister(spark, baseT)
  }
}
