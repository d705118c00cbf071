package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{GraftCatalog, GraftCatalogRelations}
import graft.sink.{TxFileIndex, TxTable}

/** Catalog statistics: the commit log's per-file `#rows` footer stats
  * surface as an EXACT table rowCount (DV cardinalities subtracted) on
  * the planner-owned relation, and with `spark.sql.cbo.enabled` that
  * rowCount flips a join to broadcast where byte-size alone would
  * shuffle — the decision that matters when a 1000-row dim occupies
  * gigabytes on disk next to a 100 TB fact table.
  */
class CatalogStatsSpec extends AnyFunSuite {
  import TestSpark._

  private val wh = sys.props("java.io.tmpdir") + "/graft_stats_wh"

  private def ensure(): Unit = {
    spark.conf.set("spark.sql.catalog.gstat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstat.warehouse", wh)
    spark.sql("DROP NAMESPACE IF EXISTS gstat.st CASCADE")
    spark.sql("CREATE NAMESPACE gstat.st")
  }

  /** The extensions posture, driven post-analysis (the shared spec
    * session carries no extensions — same seam every catalog spec uses).
    */
  private def swapped(sql: String): DataFrame =
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      GraftCatalogRelations.applyPostAnalysis(
        spark.sql(sql).queryExecution.analyzed))

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("exact rowCount from log metadata: visible to the optimizer, " +
      "and deletion-vector deletes subtract without touching a file") {
    ensure()
    spark.sql("CREATE TABLE gstat.st.t (k BIGINT, v BIGINT, date DATE)" +
      " PARTITIONED BY (date)" +
      " TBLPROPERTIES ('graft.deletionVectors' = 'true')")
    spark.sql("INSERT INTO gstat.st.t SELECT id, id, DATE'2024-01-01'" +
      " FROM range(0, 1000)")
    spark.sql("INSERT INTO gstat.st.t SELECT id, id, DATE'2024-01-02'" +
      " FROM range(1000, 1500)")
    withConf("spark.sql.cbo.enabled" -> "true") {
      assert(swapped("SELECT * FROM gstat.st.t")
        .queryExecution.optimizedPlan.stats.rowCount.contains(BigInt(1500)))
      spark.sql("DELETE FROM gstat.st.t WHERE v < 100")
      // merge-on-read: same files, DV cardinality subtracts in metadata
      assert(swapped("SELECT * FROM gstat.st.t")
        .queryExecution.optimizedPlan.stats.rowCount.contains(BigInt(1400)))
    }
    // cbo off -> plain sizeInBytes posture, no rowCount (today's default)
    withConf("spark.sql.cbo.enabled" -> "false") {
      assert(swapped("SELECT * FROM gstat.st.t")
        .queryExecution.optimizedPlan.stats.rowCount.isEmpty)
    }
  }

  test("a file without #rows stats makes the count unknown, not a lowball") {
    ensure()
    spark.sql("CREATE TABLE gstat.st.mixed (k BIGINT, date DATE)" +
      " PARTITIONED BY (date)")
    spark.sql("INSERT INTO gstat.st.mixed SELECT id, DATE'2024-01-01'" +
      " FROM range(0, 10)")
    val loc = wh + "/st/mixed"
    val withRows = TxTable.liveStats(spark, loc).toSeq
    assert(new TxFileIndex(spark, loc, None, Some(withRows))
      .exactRowCount.contains(10L))
    // strip #rows from ONE meta — a pre-upgrade log file
    val mixed = withRows.zipWithIndex.map {
      case ((rel, m), 0) => rel -> m.copy(stats = m.stats - TxTable.RowsKey)
      case ((rel, m), _) => rel -> m
    }
    assert(new TxFileIndex(spark, loc, None, Some(mixed))
      .exactRowCount.isEmpty,
      "any pre-#rows file must make the table count unknown")
  }

  test("join-strategy flip: CBO + exact rowCount broadcasts the " +
      "big-on-disk/few-rows side where byte size alone sort-merges") {
    ensure()
    // fat: 2000 rows, ~3.2 MB incompressible on disk (over the 256 KiB
    // broadcast threshold by bytes; under it by rowCount x row width)
    spark.sql("CREATE TABLE gstat.st.fat (k BIGINT, pad STRING, date DATE)" +
      " PARTITIONED BY (date)")
    spark.sql("INSERT INTO gstat.st.fat SELECT id % 50, array_join(" +
      "transform(sequence(1, 100), i -> md5(cast(id * 100 + i AS STRING)))," +
      " ''), DATE'2024-01-01' FROM range(0, 2000)")
    // base: 200k incompressible rows — over threshold in BOTH arms, so
    // the only broadcast candidate is fat
    spark.sql("CREATE TABLE gstat.st.base (k BIGINT, v STRING, date DATE)" +
      " PARTITIONED BY (date)")
    spark.sql("INSERT INTO gstat.st.base SELECT id % 50," +
      " md5(cast(id AS STRING)), DATE'2024-01-01' FROM range(0, 200000)")
    val q = "SELECT b.k, b.v, f.pad FROM gstat.st.base b" +
      " JOIN gstat.st.fat f ON b.k = f.k"
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (256 * 1024).toString) {
      withConf("spark.sql.cbo.enabled" -> "false") {
        val p = swapped(q).queryExecution.executedPlan.toString
        assert(p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
          "size-only stats must sort-merge (both sides over threshold)\n" +
            p.take(2000))
      }
      withConf("spark.sql.cbo.enabled" -> "true") {
        val p = swapped(q).queryExecution.executedPlan.toString
        assert(p.contains("BroadcastHashJoin"),
          "exact rowCount must flip the fat side to broadcast\n" +
            p.take(2000))
      }
    }
  }
}
