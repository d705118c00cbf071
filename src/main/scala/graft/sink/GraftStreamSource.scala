package graft.sink

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

/** The tx table as a STRUCTURED STREAMING SOURCE — Delta's streaming
  * read, ClickHouse's "another system tails the table" integration:
  *
  * {{{
  *   spark.readStream.format("graft")
  *     .option("maxVersionsPerTrigger", 10)   // optional rate limit
  *     .load("/lake/flows")
  * }}}
  *
  * Offsets ARE commit versions: `getOffset` polls the log head (one
  * metadata listing — no data I/O), and `getBatch(start, end]` returns
  * exactly the files added by PURE-APPEND commits in that version
  * range ([[TxTable.appendedIn]] — the same incremental feed the
  * materialized view consumes). Rewrite commits (compact / merge /
  * optimize / z-order / retention) deliver NOTHING: merges do not
  * re-trigger consumers, the ClickHouse MV contract, matching Delta's
  * `ignoreChanges` posture. Offsets live in the engine's checkpoint,
  * and a replayed range re-reads the same immutable files — downstream
  * `foreachBatch` + [[TxTable.appendTxn]] therefore composes into an
  * exactly-once table-to-table pipeline.
  *
  * Scale shape: each poll is one log replay (checkpoint + tail) and
  * each batch plans only the delta's files through the normal
  * FileSourceScan (column pruning + parquet pushdown intact); a
  * consumer lagging less than the vacuum retention always finds its
  * files on disk. `maxVersionsPerTrigger` bounds how many commits one
  * micro-batch swallows on backfill — without it, a consumer starting
  * against a year-old table would plan its entire history as batch 0.
  *
  * The read schema is FROZEN at stream start (the era's logged
  * schema): additive base evolution mid-stream keeps delivering the
  * frozen columns (new columns appear on restart), exactly Spark's
  * contract that a streaming query's schema is fixed.
  */
class GraftStreamSource(spark: SparkSession, table: String,
    maxVersionsPerTrigger: Option[Long]) extends Source {
  maxVersionsPerTrigger.foreach(n =>
    require(n > 0, s"maxVersionsPerTrigger must be positive, got $n"))

  private val (fs, root) = TxTable.fsFor(spark, table)

  /** date partition column + the data schema of the newest version at
    * stream start, pinned for the stream's lifetime.
    */
  override val schema: StructType = GraftStreamSource.schemaFor(spark, table)
  private val frozenData: Option[StructType] =
    Some(StructType(schema.filterNot(_.name == "date")))

  /** Highest version already handed out by [[getOffset]]/[[getBatch]]
    * (recovery replays push it forward) — the base the rate limit
    * advances from.
    */
  @volatile private var planned: Long = -1L

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    // a checkpoint-restored offset arrives serialized; LongOffset's
    // json is the bare number
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val cur = TxTable.currentVersion(spark, table)
    if (cur < 0) return None
    val next = maxVersionsPerTrigger match {
      case Some(n) => math.min(cur, planned + n)
      case None    => cur
    }
    if (next <= planned) None
    else {
      planned = next
      Some(LongOffset(next))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val startV = start.map(ver).getOrElse(-1L)
    val endV = ver(end)
    if (endV > planned) planned = endV // checkpoint recovery replay
    val files = TxTable.appendedIn(fs, root, startV, endV)
    if (files.isEmpty)
      GraftSqlBridge.emptyStreamingFrame(spark, schema)
    else
      GraftSqlBridge.toStreamingFrame(
        // the engine rebinds batch output to the source schema BY
        // POSITION — project to the declared order (readFileSet leads
        // with date; the relation schema trails with it, the Spark
        // partition-column convention)
        TxTable.readFileSet(spark, root, files, frozenData)
          .select(schema.fieldNames.map(
            org.apache.spark.sql.functions.col): _*))
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftStreamSource[$table]"
}

object GraftStreamSource {
  /** The stream schema for a table: `date` + its current logged data
    * schema (footer-sampled on pre-evolution logs — same resolution as
    * the batch relation). The table must already exist: a stream needs
    * a schema before data arrives, and an empty path has neither.
    */
  def schemaFor(spark: SparkSession, table: String): StructType = {
    require(TxTable.currentVersion(spark, table) >= 0,
      s"graft stream source needs an existing table at $table " +
        "(create it with one append/overwrite first — the stream " +
        "schema is resolved from the commit log)")
    TxFileIndex.readV2(spark, table).schema
  }
}
