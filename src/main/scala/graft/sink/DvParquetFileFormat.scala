package graft.sink

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** One file's deletion-vector reference inside a scan: which sidecar
  * holds its positions, under which table-relative key.
  */
final case class DvRef(sidecarRel: String, fileRel: String)

/** The stock parquet [[ParquetFileFormat]] with DELETION VECTORS
  * subtracted at read time — the Delta `DeltaParquetFileFormat`
  * pattern re-expressed minimally. Files without a DV read through
  * the superclass untouched (vectorized, pushdown, splits); a file
  * WITH a DV is read whole (unsplittable, no row-group pushdown — a
  * skipped row would break position counting) and its rows are
  * filtered by file-order position against the decoded vector.
  *
  * The row-position identity is the parquet reader's file order:
  * with no predicate pushdown and no split, the iterator yields row
  * N of the file at step N — the same identity the DV recorded from
  * `_metadata.row_index` at delete time. Metadata columns, partition
  * values, and schema evolution all flow through the superclass.
  *
  * Whole-scan batch output is disabled while ANY file in the relation
  * carries a DV (`supportBatch` is relation-wide in the scan
  * contract; the vectorized reader still runs underneath, handing
  * rows out one at a time). That read tax — measured, not assumed
  * (SCALE.md) — is the cost of pending deletes and is exactly what
  * [[TxTable.purgeDeletes]] removes.
  *
  * Plan equality must distinguish two scans of the same files with
  * different pending deletes (exchange/subquery reuse would otherwise
  * serve stale rows), hence the value-equality override including the
  * DV map.
  */
final class DvParquetFileFormat(val rootStr: String,
    val dvRefs: Map[String, DvRef]) extends ParquetFileFormat {

  override def supportBatch(sparkSession: SparkSession,
      schema: StructType): Boolean =
    dvRefs.isEmpty && super.supportBatch(sparkSession, schema)

  override def isSplitable(sparkSession: SparkSession,
      options: Map[String, String], path: Path): Boolean =
    !dvRefs.contains(path.toString) &&
      super.isSplitable(sparkSession, options, path)

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession,
      dataSchema: StructType,
      partitionSchema: StructType,
      requiredSchema: StructType,
      filters: Seq[Filter],
      options: Map[String, String],
      hadoopConf: Configuration): PartitionedFile => Iterator[InternalRow] = {
    val base = super.buildReaderWithPartitionValues(sparkSession,
      dataSchema, partitionSchema, requiredSchema, filters, options,
      hadoopConf)
    if (dvRefs.isEmpty) return base
    // a DV'd file must see EVERY row: drop predicate pushdown for the
    // unfiltered variant (Spark re-evaluates the predicates above the
    // scan anyway — pushdown is an optimization, never the filter of
    // record)
    val noPush = super.buildReaderWithPartitionValues(sparkSession,
      dataSchema, partitionSchema, requiredSchema, Seq.empty, options,
      hadoopConf)
    // resolve payloads ONCE at plan time (driver): position arrays are
    // O(deleted rows) — the merge-on-read contract is sparse deletes,
    // bulk deletes take the copy-on-write path
    val root = new Path(rootStr)
    val fs = root.getFileSystem(hadoopConf)
    val payloads: Map[String, Array[Long]] = dvRefs.map {
      case (abs, ref) =>
        abs -> DvStore.positions(fs, root, ref.fileRel, Map(
          DvStore.pointerEntry(ref.sidecarRel, 0L))).get
    }
    (pf: PartitionedFile) => payloads.get(pf.toPath.toString) match {
      case None => base(pf)
      case Some(deleted) =>
        var pos = -1L
        noPush(pf).filter { _ =>
          pos += 1
          java.util.Arrays.binarySearch(deleted, pos) < 0
        }
    }
  }

  override def equals(other: Any): Boolean = other match {
    case d: DvParquetFileFormat =>
      d.rootStr == rootStr && d.dvRefs == dvRefs
    case _ => false
  }
  override def hashCode(): Int = (rootStr, dvRefs).##
  override def toString: String =
    s"Parquet+DV(${dvRefs.size} file(s))"
}

object DvParquetFileFormat {
  /** The scan [[org.apache.spark.sql.execution.datasources.FileFormat]]
    * for a tx file set: plain parquet when no file carries a DV
    * pointer (the overwhelmingly common case — full vectorized reads),
    * the DV-subtracting format otherwise.
    */
  def forFiles(fs: org.apache.hadoop.fs.FileSystem, root: Path,
      files: Seq[(String, TxTable.FileMeta)]): ParquetFileFormat = {
    val qroot = fs.makeQualified(root)
    val refs: Map[String, DvRef] = files.flatMap { case (rel, m) =>
      DvStore.pointerOf(m.stats).collect {
        case ptr if BloomStore.isPtr(ptr) =>
          new Path(qroot, rel).toString -> DvRef(ptr.substring(1), rel)
      }
    }.toMap
    if (refs.isEmpty) new ParquetFileFormat
    else new DvParquetFileFormat(root.toString, refs)
  }
}
