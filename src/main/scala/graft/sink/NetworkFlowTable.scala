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
    */
  def compact(spark: SparkSession, path: String,
      dates: Option[Seq[String]] = None): Unit = {
    val root = new java.io.File(path)
    val all = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("date="))
      .map(_.getName.stripPrefix("date="))
    val targets = dates.map(ds => all.filter(ds.contains(_))).getOrElse(all)
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRf)
      f.delete()
    }
    val measures = Set("bytes", "packets", "n_obs")
    targets.foreach { d =>
      val part = s"$path/date=$d"
      val df = spark.read.parquet(part)
      val dims = df.columns.filterNot(measures)
      val compacted = df.groupBy(dims.map(col): _*)
        .agg(sum("bytes").as("bytes"), sum("packets").as("packets"),
          sum("n_obs").as("n_obs"))
        // re-cluster like prepared(): the groupBy leaves arbitrary hash
        // partitions; range-partition + sort restores min/max pruning
        .repartitionByRange(sortKey.map(col): _*)
        .sortWithinPartitions(sortKey.map(col): _*)
      // stage under a leading-underscore dir: invisible to partition
      // discovery (like _temporary), and Overwrite makes a crashed
      // compaction retryable instead of wedging on leftover state
      val tmp = new java.io.File(s"$path/_compacting_$d")
      compacted.write.mode(SaveMode.Overwrite)
        .option("compression", "zstd").parquet(tmp.getPath)
      val live = new java.io.File(part)
      rmRf(live)
      require(tmp.renameTo(live), s"rename $tmp -> $part")
    }
  }

  /** W7 TTL: drop whole expired `date=` partitions (ttl_only_drop_parts=1
    * semantics — never rewrites files inside a live partition).
    */
  def retentionDelete(spark: SparkSession, path: String,
      cutoff: java.time.LocalDate): Seq[String] = {
    val root = new java.io.File(path)
    val expired = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("date="))
      .filter { f =>
        val d = f.getName.stripPrefix("date=")
        try java.time.LocalDate.parse(d).isBefore(cutoff)
        catch { case _: Exception => false }
      }
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRf)
      f.delete()
    }
    // recursive + verified: a stray subdir (e.g. _temporary from a
    // crashed write) must not leave a half-deleted partition that is
    // still reported as dropped
    expired.foreach(rmRf)
    val leftover = expired.filter(_.exists())
    require(leftover.isEmpty,
      s"TTL delete incomplete for: ${leftover.map(_.getName).mkString(",")}")
    expired.map(_.getName).toSeq
  }
}
