package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The columnar analytics table (SURVEY.md S6/O2/W7): the Spark-native
  * replacement for ClickHouse's `network_flows_0` SummingMergeTree DDL
  * (/root/reference/test/network_flows_0.sql:1-44).
  *
  *  - PARTITION BY date        -> parquet `partitionBy("date")` dirs
  *  - ORDER BY (33-dim key)    -> `sortWithinPartitions` on the key
  *    prefix at write time (clusters data for row-group min/max pruning,
  *    the analog of the sparse primary index)
  *  - LowCardinality/codecs    -> parquet dictionary + ZSTD
  *  - SummingMergeTree merges  -> aggregation is done eagerly by
  *    FlowPipeline.summarize before the write, so reads never need a
  *    final-merge sum
  *  - TTL 90 day / drop parts  -> `retentionDelete` drops whole date=
  *    partition directories
  */
object NetworkFlowTable {
  /** Sort prefix mirroring the reference ORDER BY head exactly
    * (network_flows_0.sql:41-42; date is implicit in partitioning):
    * intervalStartTime, direction, proto, localApp, remoteApp,
    * localPod, remotePod.
    */
  val sortKey: Seq[String] = Seq(
    "interval_start", "direction", "proto_name", "local_app",
    "remote_app", "local_pod", "remote_pod")

  /** Write layout: RANGE-partition on (date, sortKey…) — not
    * `repartition(date)`, which maps each calendar day to ONE shuffle
    * partition and so one write task (at ~TB/day that task is the whole
    * job). Range partitioning splits every day across many tasks along
    * the sort-key order, keeping output clustered for min/max pruning
    * while parallelizing the write. Exposed for the plan audit.
    */
  def prepared(summed: DataFrame): DataFrame =
    summed
      .repartitionByRange((col("date") +: sortKey.map(col)): _*)
      .sortWithinPartitions(sortKey.map(col): _*)

  def write(summed: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    prepared(summed)
      .write.mode(mode)
      .option("compression", "zstd")
      .partitionBy("date")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed variant for CO-LOCATED joins (SURVEY.md scale design:
    * "bucketing for co-located joins"): two tables bucketed the same
    * way on the join key shuffle NEITHER side at join time — the
    * pre-sharding that turns a recurring fact-fact join from two 100 TB
    * exchanges into zero. Bucket metadata lives in the catalog, so this
    * writes through `saveAsTable` (a plain parquet path cannot carry
    * it); `sortBy` additionally pre-sorts each bucket so the
    * sort-merge join can skip its Sort when buckets are single-file.
    * Plan-audited exchange-free in PlanAuditSpec.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("compression", "zstd")
      .format("parquet")
      .saveAsTable(table)

  // ---- transactional variant (object-store deployments) --------------
  //      The directory layout above relies on rename, which S3-style
  //      stores lack; `transactional = true` routes the same table
  //      through [[TxTable]]'s commit-log protocol instead (immutable
  //      files + one atomic log publish per change, Delta-shaped). The
  //      parquet-directory path stays the default.

  def writeTx(spark: SparkSession, summed: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Long =
    if (mode == SaveMode.Append) TxTable.append(spark, summed, path)
    else TxTable.overwrite(spark, summed, path)

  def readTx(spark: SparkSession, path: String): DataFrame =
    TxTable.read(spark, path)

  def compactTx(spark: SparkSession, path: String,
      dates: Option[Seq[String]] = None): Long =
    TxTable.compact(spark, path, dates)

  def retentionTx(spark: SparkSession, path: String,
      cutoff: java.time.LocalDate): Seq[String] =
    TxTable.retention(spark, path, cutoff)

  // ---- maintenance (compaction + TTL) over the Hadoop FileSystem API:
  //      the same code runs against file://, hdfs://, or any FS with a
  //      Hadoop connector. (On S3-style object stores rename is not
  //      atomic; the staged-swap protocol below stays safe there because
  //      every step is idempotent and recoverMaintenance rolls an
  //      interrupted swap forward — but a production deployment at that
  //      scale should use the [[TxTable]] commit-log variant, whose only
  //      publish primitive is put-if-absent.)

  private def fsFor(spark: SparkSession,
      path: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def listDatePartitions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[String] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
      .map(_.getPath.getName.stripPrefix("date="))

  /** Crash recovery for [[compact]]'s staged swap. The swap sequence per
    * date is: write `_compacting_<d>` → rename live `date=<d>` aside to
    * `_old_<d>` → rename `_compacting_<d>` into place → delete
    * `_old_<d>`. Each interruption point is distinguishable from the
    * directories left behind, so this rolls every partition forward (or
    * back) to a consistent state:
    *  - `_old_` present, live present      → crash mid-cleanup: the swap
    *    committed; delete `_old_`.
    *  - `_old_` present, live absent, `_compacting_` present → crash
    *    between the renames: the staged data is complete (the aside
    *    rename only happens after the write returns), so promote it and
    *    delete `_old_`.
    *  - `_old_` present, live absent, no `_compacting_`     → defensive:
    *    restore `_old_` to live (cannot happen under the protocol).
    *  - `_compacting_` present, no `_old_` → crash before the aside
    *    rename: the live partition is intact; delete the stale staging.
    * Runs automatically at [[compact]] entry; idempotent.
    */
  def recoverMaintenance(spark: SparkSession, path: String): Unit = {
    val (fs, root) = fsFor(spark, path)
    if (!fs.exists(root)) return
    val names = fs.listStatus(root).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
    def p(n: String) = new org.apache.hadoop.fs.Path(root, n)
    names.filter(_.startsWith("_old_")).foreach { oldName =>
      val d = oldName.stripPrefix("_old_")
      val live = p(s"date=$d")
      val staged = p(s"_compacting_$d")
      if (fs.exists(live)) fs.delete(p(oldName), true)
      else if (fs.exists(staged)) {
        require(fs.rename(staged, live), s"recover: promote $staged failed")
        fs.delete(p(oldName), true)
      } else require(fs.rename(p(oldName), live),
        s"recover: restore $oldName failed")
    }
    names.filter(_.startsWith("_compacting_")).foreach { stName =>
      val d = stName.stripPrefix("_compacting_")
      if (!fs.exists(p(s"_old_$d")) && fs.exists(p(s"date=$d")) &&
        fs.exists(p(stName)))
        fs.delete(p(stName), true)
    }
  }

  /** The background-merge analog (SummingMergeTree, DDL :39): rows
    * appended by late micro-batches that share the dimension key are
    * collapsed by re-summing. Run periodically (or from foreachBatch on
    * a cadence); reads stay correct either way because readers also
    * aggregate — compaction only reclaims space and restores clustering.
    *
    * Like the reference's per-part merges, compaction is PER DATE
    * PARTITION: pass `dates` to rewrite only the partitions that
    * received late appends (at ~TB/day, a whole-table rewrite is not an
    * option); default rewrites every partition.
    *
    * The live partition is never deleted before its replacement is in
    * place: it is renamed aside to `_old_<d>` (leading underscore =
    * invisible to partition discovery), the staged data promoted, and
    * only then the aside copy dropped. A crash at any point is repaired
    * by [[recoverMaintenance]] without data loss.
    */
  def compact(spark: SparkSession, path: String,
      dates: Option[Seq[String]] = None): Unit = {
    recoverMaintenance(spark, path)
    val (fs, root) = fsFor(spark, path)
    val all = listDatePartitions(fs, root)
    val targets = dates.map(ds => all.filter(ds.contains(_))).getOrElse(all)
    val measures = Set("bytes", "packets", "n_obs")
    targets.foreach { d =>
      val live = new org.apache.hadoop.fs.Path(root, s"date=$d")
      val staged = new org.apache.hadoop.fs.Path(root, s"_compacting_$d")
      val aside = new org.apache.hadoop.fs.Path(root, s"_old_$d")
      val df = spark.read.parquet(live.toString)
      val dims = df.columns.filterNot(measures)
      val compacted = df.groupBy(dims.map(col): _*)
        .agg(sum("bytes").as("bytes"), sum("packets").as("packets"),
          sum("n_obs").as("n_obs"))
        // re-cluster like prepared(): the groupBy leaves arbitrary hash
        // partitions; range-partition + sort restores min/max pruning
        .repartitionByRange(sortKey.map(col): _*)
        .sortWithinPartitions(sortKey.map(col): _*)
      compacted.write.mode(SaveMode.Overwrite)
        .option("compression", "zstd").parquet(staged.toString)
      require(fs.rename(live, aside), s"rename $live -> $aside")
      require(fs.rename(staged, live), s"rename $staged -> $live")
      fs.delete(aside, true)
    }
  }

  /** W7 TTL: drop whole expired `date=` partitions (ttl_only_drop_parts=1
    * semantics — never rewrites files inside a live partition).
    */
  def retentionDelete(spark: SparkSession, path: String,
      cutoff: java.time.LocalDate): Seq[String] = {
    val (fs, root) = fsFor(spark, path)
    val expired = listDatePartitions(fs, root).filter { d =>
      try java.time.LocalDate.parse(d).isBefore(cutoff)
      catch { case _: Exception => false }
    }
    // recursive + verified: a stray subdir (e.g. _temporary from a
    // crashed write) must not leave a half-deleted partition that is
    // still reported as dropped
    val leftover = expired.filter { d =>
      val p = new org.apache.hadoop.fs.Path(root, s"date=$d")
      fs.delete(p, true)
      fs.exists(p)
    }
    require(leftover.isEmpty,
      s"TTL delete incomplete for: ${leftover.mkString(",")}")
    expired.map("date=" + _)
  }
}
