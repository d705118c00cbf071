package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

import graft.sink.TxTable

/** Table-maintenance PROCEDURES (`CALL gcat.sys.<proc>(...)`) — the
  * ops surface every lakehouse ships as stored procedures (Iceberg's
  * `CALL catalog.system.*` posture, public knowledge) mapped onto the
  * tx-table primitives. SQL owns maintenance end to end:
  *
  * {{{
  *   CALL gcat.sys.optimize(table => 'prod.flows')
  *   CALL gcat.sys.zorder(table => 'prod.flows', columns => 'src,dst')
  *   CALL gcat.sys.vacuum(table => 'prod.flows', min_age_ms => 0)
  *   CALL gcat.sys.expire_log(table => 'prod.flows')
  *   CALL gcat.sys.history(table => 'prod.flows')
  * }}}
  *
  * Each returns a small driver-side result set (a [[LocalScan]]):
  * maintenance is metadata-scale on the driver; the heavy lifting
  * (rewrites) runs as ordinary distributed jobs inside the primitive.
  */
object GraftProcedures {

  private def spark: SparkSession = SparkSession.active

  val names: Seq[String] =
    Seq("vacuum", "optimize", "zorder", "expire_log", "history",
      "purge_deletes", "analyze")

  def load(name: String, catalog: GraftCatalog): UnboundProcedure =
    name.toLowerCase match {
      case "vacuum"     => new VacuumProc(catalog)
      case "optimize"   => new OptimizeProc(catalog)
      case "zorder"     => new ZorderProc(catalog)
      case "expire_log" => new ExpireLogProc(catalog)
      case "history"    => new HistoryProc(catalog)
      case "purge_deletes" => new PurgeDeletesProc(catalog)
      case "compact_aggregating" => new CompactAggregatingProc(catalog)
      case "clone" => new CloneProc(catalog)
      case "attach_partition" => new AttachPartitionProc(catalog)
      case "parts" => new PartsProc(catalog)
      case "analyze" => new AnalyzeProc(catalog)
      case "stats" => new StatsProc(catalog)
      case "drop_partition" => new DropPartitionProc(catalog)
      case other => throw new RuntimeException(
        s"no such procedure gcat.sys.$other — available: " +
          names.mkString(", "))
    }

  /** `table` parameter ('ns.t' within this catalog) → warehouse path. */
  private def pathOf(catalog: GraftCatalog, table: String): String = {
    val parts = table.split('.')
    require(parts.length >= 2,
      s"procedure table arguments are catalog-relative: 'ns.table', " +
        s"got '$table'")
    catalog.tablePath(Identifier.of(parts.dropRight(1), parts.last))
  }

  private def result(schema: StructType,
      rows: Seq[Seq[Any]]): java.util.Iterator[Scan] = {
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    val internal = rows.map(r =>
      conv(org.apache.spark.sql.Row.fromSeq(r)).asInstanceOf[InternalRow])
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = internal.toArray
    }
    java.util.Collections.singletonList(scan).iterator()
  }

  private abstract class SysProc(procName: String,
      params: Seq[ProcedureParameter]) extends UnboundProcedure
      with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
  }

  private def tableParam =
    ProcedureParameter.in("table", StringType)
      .comment("catalog-relative table name: 'ns.table'").build()

  private class VacuumProc(catalog: GraftCatalog)
      extends SysProc("vacuum", Seq(tableParam,
        ProcedureParameter.in("min_age_ms", LongType)
          .defaultValue("604800000").build())) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val reclaimed = TxTable.vacuum(spark,
        pathOf(catalog, input.getUTF8String(0).toString),
        input.getLong(1))
      result(StructType(Seq(
        StructField("reclaimed_files", LongType, nullable = false))),
        Seq(Seq(reclaimed.size.toLong)))
    }
  }

  private class OptimizeProc(catalog: GraftCatalog)
      extends SysProc("optimize", Seq(tableParam,
        ProcedureParameter.in("target_file_bytes", LongType)
          .defaultValue((128L * 1024 * 1024).toString).build())) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dates = TxTable.optimize(spark,
        pathOf(catalog, input.getUTF8String(0).toString),
        input.getLong(1))
      result(StructType(Seq(
        StructField("compacted_dates", LongType, nullable = false))),
        Seq(Seq(dates.size.toLong)))
    }
  }

  private class ZorderProc(catalog: GraftCatalog)
      extends SysProc("zorder", Seq(tableParam,
        ProcedureParameter.in("columns", StringType)
          .comment("comma-separated sort columns (>= 2)").build())) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = TxTable.zorder(spark,
        pathOf(catalog, input.getUTF8String(0).toString),
        input.getUTF8String(1).toString.split(',').map(_.trim).toSeq)
      result(StructType(Seq(
        StructField("version", LongType, nullable = false))),
        Seq(Seq(v)))
    }
  }

  /** `CALL gcat.sys.compact_aggregating('ns.t', 'k1,k2',
    * 'col:kind,col:kind')` — the AggregatingMergeTree background merge
    * ([[TxTable.compactAggregating]]) as SQL: state rows with equal
    * keys re-merge to one row per (date, keys).
    */
  private class CompactAggregatingProc(catalog: GraftCatalog)
      extends SysProc("compact_aggregating", Seq(tableParam,
        ProcedureParameter.in("keys", StringType)
          .comment("comma-separated key columns").build(),
        ProcedureParameter.in("states", StringType)
          .comment("comma-separated col:kind pairs " +
            "(sum|count|min|max|avg|uniqExact|hll)").build())) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val states = input.getUTF8String(2).toString.split(',').map { p =>
        p.split(':') match {
          case Array(c, k) => c.trim -> k.trim
          case _ => throw new IllegalArgumentException(
            s"states entry `$p` is not col:kind")
        }
      }.toMap
      val v = TxTable.compactAggregating(spark,
        pathOf(catalog, input.getUTF8String(0).toString),
        input.getUTF8String(1).toString.split(',').map(_.trim).toSeq,
        states)
      result(StructType(Seq(
        StructField("version", LongType, nullable = false))),
        Seq(Seq(v)))
    }
  }

  /** `CALL gcat.sys.clone(source => 'ns.s', target => 'ns.t',
    * shallow => true, version => -1)` — [[TxTable.cloneTable]]:
    * shallow = one metadata commit referencing the source's files
    * (zero data I/O), deep = a materialized copy. version -1 = head.
    */
  private class CloneProc(catalog: GraftCatalog)
      extends SysProc("clone", Seq(
        ProcedureParameter.in("source", StringType).build(),
        ProcedureParameter.in("target", StringType).build(),
        ProcedureParameter.in("shallow", BooleanType)
          .defaultValue("true").build(),
        ProcedureParameter.in("version", LongType)
          .defaultValue("-1").build())) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val asOf = input.getLong(3) match {
        case -1L => None
        case v   => Some(v)
      }
      val v = TxTable.cloneTable(spark,
        pathOf(catalog, input.getUTF8String(0).toString),
        pathOf(catalog, input.getUTF8String(1).toString),
        input.getBoolean(2), asOf)
      result(StructType(Seq(
        StructField("version", LongType, nullable = false))),
        Seq(Seq(v)))
    }
  }

  /** `CALL gcat.sys.drop_partition(table => 'ns.t',
    * date => '2024-01-01')` — [[TxTable.dropPartition]]: one
    * metadata commit drops the date; -1 when it held nothing.
    */
  private class DropPartitionProc(catalog: GraftCatalog)
      extends SysProc("drop_partition", Seq(tableParam,
        ProcedureParameter.in("date", StringType).build())) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = TxTable.dropPartition(spark,
        pathOf(catalog, input.getUTF8String(0).toString),
        input.getUTF8String(1).toString)
      result(StructType(Seq(
        StructField("version", LongType, nullable = false))),
        Seq(Seq(v)))
    }
  }

  /** `CALL gcat.sys.attach_partition(source => 'ns.s',
    * target => 'ns.t', date => '2024-01-01')` —
    * [[TxTable.attachPartitionFrom]]: one date partition joins the
    * target by reference, one metadata commit.
    */
  private class AttachPartitionProc(catalog: GraftCatalog)
      extends SysProc("attach_partition", Seq(
        ProcedureParameter.in("source", StringType).build(),
        ProcedureParameter.in("target", StringType).build(),
        ProcedureParameter.in("date", StringType).build(),
        ProcedureParameter.in("replace", BooleanType)
          .defaultValue("false").build())) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = TxTable.attachPartitionFrom(spark,
        pathOf(catalog, input.getUTF8String(0).toString),
        pathOf(catalog, input.getUTF8String(1).toString),
        input.getUTF8String(2).toString,
        input.getBoolean(3))
      result(StructType(Seq(
        StructField("version", LongType, nullable = false))),
        Seq(Seq(v)))
    }
  }

  /** `CALL gcat.sys.analyze(table => 'ns.t')` — backfill footer-derived
    * count stats onto pre-upgrade log entries ([[TxTable.analyzeTable]]):
    * ANALYZE TABLE's job, done from parquet footers + one metadata
    * commit, no data rewrite, no scan.
    *
    * `CALL gcat.sys.analyze(table => 'ns.t', columns => 'v,k')` — the
    * opt-in FULL arm ([[TxTable.analyzeColumnsFull]]): one
    * column-pruned scan computes per-file approximate NDV, null
    * counts and min/max ranges for the named columns — `ANALYZE TABLE
    * ... COMPUTE STATISTICS FOR COLUMNS`, metadata-committed so every
    * later session's CBO sees it without re-scanning.
    */
  private class AnalyzeProc(catalog: GraftCatalog)
      extends SysProc("analyze", Seq(tableParam,
        ProcedureParameter.in("columns", StringType)
          .comment("optional comma-separated columns for the full " +
            "value-pass arm (NDV/nulls/min-max)")
          .defaultValue("''").build())) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val path = pathOf(catalog, input.getUTF8String(0).toString)
      val cols =
        if (input.isNullAt(1)) Seq.empty
        else input.getUTF8String(1).toString.split(',')
          .map(_.trim).filter(_.nonEmpty).toSeq
      val n =
        if (cols.isEmpty) TxTable.analyzeTable(spark, path)
        else TxTable.analyzeColumnsFull(spark, path, cols)
      result(StructType(Seq(
        StructField("files_backfilled", LongType, nullable = false))),
        Seq(Seq(math.max(n, 0L))))
    }
  }

  /** `CALL gcat.sys.stats(table => 'ns.t')` — the optimizer's view of
    * the table, from log metadata alone: one `#table` row with the
    * exact live row count, then one row per counted column (NDV upper
    * bound, exact null count). What `DESCRIBE EXTENDED` shows for an
    * ANALYZE'd Hive table, served with zero data I/O.
    */
  private class StatsProc(catalog: GraftCatalog)
      extends SysProc("stats", Seq(tableParam)) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val loc = pathOf(catalog, input.getUTF8String(0).toString)
      val ix = new graft.sink.TxFileIndex(spark, loc)
      val head = Seq[Any]("#table",
        ix.exactRowCount.map(Long.box).orNull, null, null, null)
      // min/max from the folded per-file ranges (footer- or
      // analyze-full-derived), rendered in the log's own encoding
      // ('l' = long / epoch-micros / epoch-days, 's' = raw string)
      val ranges = ix.columnRangeStats
      val cols = (ix.columnCountStats.keySet ++ ranges.keySet)
        .toSeq.sorted.map { c =>
          val (ndv, nulls) = ix.columnCountStats
            .getOrElse(c, (None: Option[Long], None: Option[Long]))
          val rg = ranges.get(c)
          Seq[Any](c, ndv.map(Long.box).orNull,
            nulls.map(Long.box).orNull,
            rg.map(_._2).orNull, rg.map(_._3).orNull)
        }
      result(StructType(Seq(
        StructField("column", StringType, nullable = false),
        StructField("ndv_upper", LongType, nullable = true),
        StructField("null_count", LongType, nullable = true),
        StructField("min", StringType, nullable = true),
        StructField("max", StringType, nullable = true))),
        head +: cols)
    }
  }

  private class ExpireLogProc(catalog: GraftCatalog)
      extends SysProc("expire_log", Seq(tableParam)) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val dropped = TxTable.expireLog(spark,
        pathOf(catalog, input.getUTF8String(0).toString))
      result(StructType(Seq(
        StructField("expired_commits", LongType, nullable = false))),
        Seq(Seq(dropped.size.toLong)))
    }
  }

  /** Materialize pending deletion vectors into physical rewrites
    * (Delta's `REORG ... APPLY (PURGE)`): restores vectorized batch
    * reads after merge-on-read deletes.
    */
  private class PurgeDeletesProc(catalog: GraftCatalog)
      extends SysProc("purge_deletes", Seq(tableParam)) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val v = TxTable.purgeDeletes(spark,
        pathOf(catalog, input.getUTF8String(0).toString))
      result(StructType(Seq(
        StructField("version", LongType, nullable = false))),
        Seq(Seq(v)))
    }
  }

  private class HistoryProc(catalog: GraftCatalog)
      extends SysProc("history", Seq(tableParam)) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val df = TxTable.history(spark,
        pathOf(catalog, input.getUTF8String(0).toString))
      result(df.schema, df.collect().map(_.toSeq).toSeq)
    }
  }

  /** `CALL gcat.sys.parts(table => 'ns.t')` — ClickHouse
    * `system.parts` analog: one row per live data file from the commit
    * log (NO directory listing, like every other metadata read), with
    * its date partition, bytes, bucket id when the table is bucketed,
    * deletion-vector pointer when one rides the file, and the
    * min/max-stat column list the planner can skip on. The first stop
    * for "why is this table slow / big / unclustered".
    */
  private class PartsProc(catalog: GraftCatalog)
      extends SysProc("parts", Seq(tableParam)) {
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val metas = TxTable.liveStats(spark,
        pathOf(catalog, input.getUTF8String(0).toString))
      val rows = metas.toSeq.sortBy(_._1).map { case (rel, m) =>
        val bucket = org.apache.spark.sql.execution.datasources
          .BucketingUtils
          .getBucketId(new org.apache.hadoop.fs.Path(rel).getName)
          .map(_.toLong).getOrElse(-1L)
        val dv = graft.sink.DvStore.pointerOf(m.stats).orNull
        val statCols = m.stats.keys.filterNot(_.contains("#"))
          .toSeq.sorted.mkString(",")
        Seq(rel, m.date, m.bytes, bucket, dv, statCols)
      }
      result(StructType(Seq(
        StructField("file", StringType, nullable = false),
        StructField("date", StringType, nullable = false),
        StructField("bytes", LongType, nullable = false),
        StructField("bucket", LongType, nullable = false),
        StructField("deletion_vector", StringType, nullable = true),
        StructField("stat_columns", StringType, nullable = false))),
        rows)
    }
  }
}
