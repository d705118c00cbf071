package graft.sink

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DateType, StructField, StructType}

/** [[TxTable]] plugged into Spark's REAL scan planner — the
  * Delta/TahoeFileIndex integration pattern: a custom [[FileIndex]]
  * whose file listing and partition values come from the COMMIT LOG
  * (relpath, date, bytes per file — zero filesystem listing or
  * getFileStatus calls), handed to `HadoopFsRelation` + the stock
  * parquet `FileFormat`. Everything downstream is the normal
  * `FileSourceScanExec` machinery: `WHERE date = ...` becomes a
  * PartitionFilters entry evaluated here in [[listFiles]] (whole files
  * skipped from log metadata), data predicates still push into the
  * parquet row-group reader, column pruning and whole-stage codegen
  * apply unchanged. This is what [[TxTable.read]]'s hand-built
  * per-date union cannot give: one relation, planner-owned pruning.
  */
class TxFileIndex(spark: SparkSession, table: String) extends FileIndex {
  private val root = new Path(table)
  private val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
  private val qroot = fs.makeQualified(root)

  /** (date string, files with log-recorded sizes), from one log replay. */
  @volatile private var byDate: Seq[(String, Seq[FileStatus])] = load()

  private def load(): Seq[(String, Seq[FileStatus])] =
    TxTable.snapshotFiles(fs, root).toSeq
      .groupBy(_._2._1).toSeq.sortBy(_._1)
      .map { case (d, files) =>
        d -> files.map { case (rel, (_, len)) =>
          new FileStatus(len, false, 1, len, 0L, new Path(qroot, rel))
        }
      }

  override val partitionSchema: StructType =
    StructType(Seq(StructField("date", DateType, nullable = false)))

  override def rootPaths: Seq[Path] = Seq(qroot)

  override def refresh(): Unit = { byDate = load() }

  override def inputFiles: Array[String] =
    byDate.flatMap(_._2.map(_.getPath.toString)).toArray

  override def sizeInBytes: Long =
    byDate.flatMap(_._2.map(_.getLen)).sum

  private def daysSinceEpoch(d: String): Int =
    java.time.LocalDate.parse(d).toEpochDay.toInt

  /** Partition pruning: rebind the planner's `date` references to this
    * index's single-column partition row and evaluate per date group —
    * files of filtered-out dates never reach the scan.
    */
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val keep: String => Boolean =
      if (partitionFilters.isEmpty) _ => true
      else {
        val bound = partitionFilters.reduce(And).transform {
          case a: AttributeReference if a.name == "date" =>
            BoundReference(0, DateType, nullable = false)
        }
        val pred = Predicate.create(bound, Nil)
        pred.initialize(0)
        d => pred.eval(InternalRow(daysSinceEpoch(d)))
      }
    byDate.collect { case (d, files) if keep(d) =>
      PartitionDirectory(InternalRow(daysSinceEpoch(d)), files.toArray)
    }
  }
}

object TxFileIndex {
  /** Snapshot read through the planner-integrated index. The data
    * schema is taken from one live file's footer (all files share the
    * write schema); `date` rides as the partition column exactly like
    * a hive-layout parquet table.
    */
  def readV2(spark: SparkSession, table: String): DataFrame = {
    val index = new TxFileIndex(spark, table)
    val sample = index.inputFiles.headOption.getOrElse(
      throw new IllegalArgumentException(s"tx table $table has no live files"))
    val dataSchema = spark.read.parquet(sample).schema
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = Map.empty)(spark)
    spark.baseRelationToDataFrame(relation)
  }
}
