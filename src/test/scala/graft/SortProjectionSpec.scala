package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SortProjections
import graft.sink.{SortProjection, TxFileIndex, TxTable}

/** Sort-order PROJECTION routing: filtered scans written against the
  * BASE tx table are transparently served from the alternate-clustered
  * copy when the filter touches its cluster keys and the copy is
  * current — scanning FEWER FILES for the same answer — and NEVER
  * otherwise (stale, destructive, or key-less filters degrade to the
  * base scan).
  */
class SortProjectionSpec extends AnyFunSuite {
  import TestSpark._

  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources
              .HadoopFsRelation => h.location.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten

  /** Executed-plan scan file count (collect first so metrics land). */
  private def executedFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head.metrics("numFiles").value
  }

  /** Same corpus shape as TxTableSpec's z-order test: dim combos
    * uncorrelated with time, so the base's time-led layout can never
    * skip on a dim predicate — the projection's whole reason to exist.
    */
  private def facts(n: Long) = spark.range(n).select(
    to_date(lit("2024-03-01")).as("date"),
    timestamp_micros(lit(1709251200000000L) + col("id") * 1000000L)
      .as("interval_start"),
    concat(lit("d"), pmod(col("id"), lit(8)).cast("string"))
      .as("direction"),
    concat(lit("p"), pmod(col("id") * 7, lit(4)).cast("string"))
      .as("proto_name"),
    (col("id") * 3).as("bytes"))

  private val keys = Seq("proto_name", "direction")

  test("dim-filtered scans route to the projection, prune files, and " +
    "return the base's exact answer; key-less filters stay on the base") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sortproj").toString
    val (baseT, projT) = (s"$dir/base", s"$dir/proj")
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesceKey, "false")
    try {
      TxTable.append(spark, facts(20000L), baseT)
      assert(SortProjection.refresh(spark, baseT, projT, keys) >= 0)
      SortProjections.register(spark, baseT, projT, keys)

      // no aggregate: AQE would wrap the executed plan in adaptive
      // query stages and hide the scan node from the metrics probe
      def q() = TxFileIndex.readV2(spark, baseT)
        .filter(col("proto_name") === "p1" && col("direction") === "d3")
      // expected from the projection-blind reader (readFileSet scans
      // are not TxFileIndex relations, the rule cannot touch them)
      val expected = TxTable.read(spark, baseT)
        .filter(col("proto_name") === "p1" && col("direction") === "d3")
        .agg(count(lit(1)), sum("bytes")).collect().head.toSeq

      val routed = q()
      assert(scannedPaths(routed).nonEmpty &&
        scannedPaths(routed).forall(_.contains("/proj/")),
        "key-touching filter must be served by the projection")
      assert(q().agg(count(lit(1)), sum("bytes")).collect().head.toSeq
        == expected,
        "the projection route must not change the answer")

      // PRUNING: the projection files are key-clustered, so the
      // equality predicate proves most of them out via log stats;
      // the base (time-clustered) would scan everything
      val projFiles = TxTable.liveFiles(spark, projT).size
      val scanned = executedFiles(q())
      assert(projFiles > 2 && scanned < projFiles,
        s"dim predicate must skip projection files ($scanned of $projFiles)")

      // a filter not touching any cluster key stays on the base
      val unkeyed = TxFileIndex.readV2(spark, baseT)
        .filter(col("bytes") > 100)
        .agg(count(lit(1)).as("n"))
      assert(scannedPaths(unkeyed).forall(_.contains("/base/")),
        "key-less filters must not route")
    } finally {
      spark.conf.unset(coalesceKey)
      SortProjections.deregister(spark, baseT)
    }
  }

  test("staleness degrades to the base; refresh re-enables; destructive " +
    "base commits rebuild; time travel never routes") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sortproj2").toString
    val (baseT, projT) = (s"$dir/base", s"$dir/proj")
    try {
      TxTable.append(spark, facts(4000L), baseT)
      assert(SortProjection.refresh(spark, baseT, projT, keys) >= 0)
      SortProjections.register(spark, baseT, projT, keys)
      def q() = TxFileIndex.readV2(spark, baseT)
        .filter(col("proto_name") === "p2")
        .agg(count(lit(1)).as("n"), sum("bytes").as("b"))
      assert(scannedPaths(q()).forall(_.contains("/proj/")))

      // new base data → stale → base scan serves (fresh rows included)
      TxTable.append(spark, facts(1000L), baseT)
      assert(!SortProjection.isCurrent(spark, baseT, projT))
      assert(scannedPaths(q()).forall(_.contains("/base/")),
        "a stale projection must never serve")
      val expectAfterAppend = q().collect().head.toSeq
      // incremental refresh (pure-append range) re-enables the route
      assert(SortProjection.refresh(spark, baseT, projT, keys) >= 0)
      assert(scannedPaths(q()).forall(_.contains("/proj/")))
      assert(q().collect().head.toSeq == expectAfterAppend)

      // destructive commit → refresh REBUILDS; deleted rows are gone
      // from the routed answer
      assert(TxTable.delete(spark, baseT, col("direction") === "d3") >= 0)
      assert(!SortProjection.isCurrent(spark, baseT, projT))
      assert(SortProjection.refresh(spark, baseT, projT, keys) >= 0)
      val routed = TxFileIndex.readV2(spark, baseT)
        .filter(col("proto_name") === "p1")
        .groupBy("direction").agg(sum("bytes").as("b"))
      assert(scannedPaths(routed).forall(_.contains("/proj/")))
      assert(!routed.collect().map(_.getString(0)).contains("d3"),
        "rebuild must drop the deleted rows")

      // duplicate refresh of a covered version no-ops
      assert(SortProjection.refresh(spark, baseT, projT, keys) == -1L)

      // a time-travelled base scan is pinned history — never routed
      val tt = spark.baseRelationToDataFrame(
          TxFileIndex.relation(spark, baseT, Some(0L)))
        .filter(col("proto_name") === "p1")
      assert(scannedPaths(tt).forall(_.contains("/base/")),
        "time travel must read the base's history, not the projection")
    } finally SortProjections.deregister(spark, baseT)
  }

  test("layout-only base rewrites advance the mark WITHOUT copying; " +
    "streaming ingest keeps the projection current per batch and " +
    "replays no-op") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sortproj3").toString
    val (baseT, projT) = (s"$dir/base", s"$dir/proj")
    try {
      TxTable.append(spark, facts(4000L), baseT)
      assert(SortProjection.refresh(spark, baseT, projT, keys) >= 0)
      val filesAfterFirst = TxTable.liveFiles(spark, projT).size
      // z-order the BASE: content-preserving, so the projection stays
      // valid — the refresh advances the mark with a data-less commit
      // and the projection's file set is untouched
      assert(TxTable.zorder(spark, baseT,
        Seq("direction", "proto_name")) >= 0)
      assert(SortProjection.isCurrent(spark, baseT, projT),
        "a layout rewrite must not read as staleness")
      assert(SortProjection.refresh(spark, baseT, projT, keys) >= 0)
      assert(TxTable.liveFiles(spark, projT).size == filesAfterFirst,
        "mark-only advance must not copy data")

      // streaming ingest: appendTxn + refresh per micro-batch — the
      // projection covers the base after EVERY batch (routing never
      // lags the stream), and a zombie replay no-ops end to end
      SortProjections.register(spark, baseT, projT, keys)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext
      import spark.implicits._
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Long]
      val rows = mem.toDF().select(
        to_date(lit("2024-03-01")).as("date"),
        timestamp_micros(lit(1709251200000000L) + col("value") * 1000000L)
          .as("interval_start"),
        concat(lit("d"), pmod(col("value"), lit(8)).cast("string"))
          .as("direction"),
        concat(lit("p"), pmod(col("value") * 7, lit(4)).cast("string"))
          .as("proto_name"),
        (col("value") * 3).as("bytes"))
      val q = rows.writeStream
        .option("checkpointLocation", s"$dir/cp")
        .foreachBatch { (b: DataFrame, id: Long) =>
          if (TxTable.appendTxn(spark, b, baseT, "sp-stream", id) >= 0)
            require(SortProjection.refresh(spark, baseT, projT,
              keys) >= 0, s"on-insert refresh of batch $id must apply")
          require(SortProjection.isCurrent(spark, baseT, projT),
            s"projection lags after batch $id")
          ()
        }.start()
      try {
        mem.addData(100000L until 100400L: _*)
        q.processAllAvailable()
        mem.addData(100400L until 100800L: _*)
        q.processAllAvailable()
      } finally q.stop()
      def routedCount() = {
        val r = TxFileIndex.readV2(spark, baseT)
          .filter(col("proto_name") === "p1")
          .agg(count(lit(1)).as("n"), sum("bytes").as("b"))
        assert(scannedPaths(r).forall(_.contains("/proj/")))
        r.collect().head.toSeq
      }
      val afterStream = routedCount()
      // zombie replay of batch 0: mark-swallowed, nothing changes
      assert(TxTable.appendTxn(spark,
        TxTable.read(spark, baseT).limit(10), baseT, "sp-stream", 0L)
        == -1L, "replayed batch must be refused by the txn mark")
      assert(SortProjection.refresh(spark, baseT, projT, keys) == -1L)
      assert(routedCount() == afterStream)
    } finally SortProjections.deregister(spark, baseT)
  }
}
