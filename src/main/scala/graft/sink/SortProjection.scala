package graft.sink

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DateType, StructField, StructType}

/** ClickHouse's SECOND projection kind — the sort-order projection
  * (`ALTER TABLE ... ADD PROJECTION p (SELECT * ORDER BY other_key)`):
  * a full-row copy of the base table clustered on a DIFFERENT key, so
  * point/range filters on that key prune by the projection's tight
  * per-file min/max envelopes where the base's (clustered on its own
  * sort key — the reference's `ORDER BY intervalStartTime, ...`,
  * test/network_flows_0.sql:41) span the whole domain and can never
  * skip. [[graft.plans.SortProjections]] routes filtered scans written
  * AGAINST THE BASE to the projection automatically — the ClickHouse
  * query-time selection, as a Catalyst rule.
  *
  * Maintenance mirrors [[MaterializedView]]'s commit-log protocol:
  *  - a (WriterApp → base version) high-water mark on the PROJECTION
  *    table records coverage; every advance is a CAS (`expectMark`),
  *    so racing refreshers apply an overlapping delta at most once;
  *  - pure-append base ranges apply INCREMENTALLY — only the delta
  *    files are read, re-clustered on the projection keys, appended
  *    ([[TxTable.appendTxnClustered]]). Each refresh batch is
  *    range-shuffled on the keys, so every projection file stays
  *    narrow however many refreshes land;
  *  - layout-only base ranges (optimize / z-order) are
  *    content-preserving: the mark advances with a data-less commit;
  *  - a DESTRUCTIVE base commit (merge / delete / delete-mor /
  *    compact / retention / rollup / overwrite) triggers a full
  *    [[rebuild]] — exactly what ClickHouse does to projections on a
  *    mutation: raw-row copies have no mergeable states to retract
  *    against, and serving possibly-deleted rows is never acceptable.
  *
  * Scale shape (100 TB): refresh I/O is O(new data) per cycle; the
  * rebuild is the one full-scan cost, paid only on mutation (CH's own
  * contract). The read-side payoff is the point of the feature: a
  * dashboard filter on a non-primary dimension reads O(matching
  * files) from the projection instead of scanning the time-clustered
  * base end to end — while the base keeps ITS clustering for
  * time-range queries, which a destructive re-sort (zorder) of the
  * base would have given up.
  */
object SortProjection {
  /** Writer id for the (appId → applied base version) mark — distinct
    * from [[MaterializedView.WriterApp]] so an MV and a sort
    * projection of the same base track coverage independently. */
  val WriterApp = "graft-sortproj"

  def lastApplied(spark: SparkSession, projTable: String): Long = {
    val (fs, root) = TxTable.fsFor(spark, projTable)
    TxTable.txnHighWater(fs, root).getOrElse(WriterApp, -1L)
  }

  /** True iff serving a scan from the projection equals serving it
    * from the base: every base commit past the applied mark is a
    * content-preserving layout rewrite or a data-less mark. New data
    * means missing rows; a destructive commit means the projection
    * still has rows the base dropped; an expired (unreadable) range
    * means unverifiable — all three read as stale, and the routing
    * rule degrades to the base scan, never to a stale answer.
    */
  def isCurrent(spark: SparkSession, baseTable: String,
      projTable: String): Boolean = {
    val applied = lastApplied(spark, projTable)
    val (fs, root) = TxTable.fsFor(spark, baseTable)
    val cur = TxTable.currentVersion(spark, baseTable)
    cur >= 0 && (cur == applied || {
      val (complete, newData, destructive) =
        TxTable.rangeSummary(fs, root, applied, cur)
      complete && !newData && !destructive
    })
  }

  /** Fold the base's un-applied commits into the projection. Returns
    * the projection commit version, or -1 when already up to date (or
    * a concurrent refresher won the CAS — either way the projection
    * covers the versions this call saw).
    */
  def refresh(spark: SparkSession, baseTable: String, projTable: String,
      keys: Seq[String]): Long = {
    require(keys.nonEmpty, "a sort projection needs at least one key")
    val (bfs, broot) = TxTable.fsFor(spark, baseTable)
    val cur = TxTable.currentVersion(spark, baseTable)
    if (cur < 0) return -1L
    val last = lastApplied(spark, projTable)
    if (cur <= last) return -1L
    val (complete, destructive, delta) =
      TxTable.rangeDelta(bfs, broot, last, cur)
    if (!complete || destructive)
      return rebuild(spark, baseTable, projTable, keys)
    if (delta.isEmpty)
      return TxTable.commitTxnMark(spark, projTable, WriterApp, cur,
        expectMark = Some(last))
    val rows = TxTable.readFileSet(spark, broot, delta,
      TxTable.logSchema(bfs, broot, Some(cur)))
    TxTable.appendTxnClustered(spark, rows, projTable, WriterApp, cur,
      keys, expectMark = Some(last))
  }

  /** Full recompute: re-cluster the base's CURRENT snapshot on the
    * projection keys and atomically replace the projection's whole
    * file set, mark included ([[TxTable.overwriteTxnClustered]]) — the
    * mutation-recovery path, and what the FIRST refresh over a base
    * with prior rewrites needs (the incremental feed skips rewrite
    * commits, so their files would otherwise never be seen).
    */
  def rebuild(spark: SparkSession, baseTable: String, projTable: String,
      keys: Seq[String]): Long = {
    val (bfs, broot) = TxTable.fsFor(spark, baseTable)
    val cur = TxTable.currentVersion(spark, baseTable)
    if (cur < 0) return -1L
    val live = TxTable.snapshotFiles(bfs, broot, Some(cur))
    val rows =
      if (live.nonEmpty)
        TxTable.readFileSet(spark, broot, live.toSeq,
          TxTable.logSchema(bfs, broot, Some(cur)))
      else {
        // base fully emptied: the projection's truth is zero rows
        val sch = TxTable.logSchema(bfs, broot, Some(cur)).getOrElse(
          throw new IllegalStateException("cannot rebuild sort " +
            s"projection over empty pre-evolution base $baseTable"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(StructField("date", DateType, nullable = true) +:
            sch.fields.toSeq))
      }
    TxTable.overwriteTxnClustered(spark, rows, projTable, WriterApp, cur,
      keys, expectMark = Some(lastApplied(spark, projTable)))
  }
}
