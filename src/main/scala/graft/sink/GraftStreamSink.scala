package graft.sink

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode

/** The tx table as a native STREAMING SINK —
  * `df.writeStream.format("graft").option("path", t)` — with
  * exactly-once built in: every micro-batch commits through
  * [[TxTable.appendTxn]] (append mode) or [[TxTable.overwriteTxn]]
  * (complete mode) carrying a `(writerId, batchId)` mark, so replayed
  * batches after checkpoint recovery, task retries, and zombie
  * duplicate writers land ZERO times — the reference's
  * insert_deduplication_token (worker.go:248) as a one-line sink
  * instead of a hand-written foreachBatch.
  *
  * `writerId` defaults to a checkpoint-location-derived id (stable
  * across restarts of the same query — which is exactly the scope
  * batch ids are monotone in); writing one table from several
  * distinct streams needs explicit per-stream writerIds, or their
  * marks would collide and drop batches.
  *
  * Update mode is refused: without a key there is nothing to update
  * into an append-only log — key-aware upserts go through
  * `foreachBatch` + [[TxTable.merge]].
  */
class GraftStreamSink(spark: SparkSession, table: String,
    writerId: String, mode: OutputMode) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = GraftSqlBridge.toBatchFrame(data)
    require(batch.columns.contains("date"),
      "graft tables are date-partitioned: the streamed frame needs a " +
        "`date` column")
    if (mode == OutputMode.Complete())
      TxTable.overwriteTxn(spark, batch, table, writerId, batchId)
    else
      TxTable.appendTxn(spark, batch, table, writerId, batchId)
    ()
  }

  override def name(): String = s"GraftStreamSink[$table]"
}

object GraftStreamSink {
  /** Stable default writer id: one per (query checkpoint) — restarts
    * of the same query keep their dedup scope, different queries get
    * different ids.
    */
  def writerIdFor(parameters: Map[String, String]): String =
    parameters.get("writerId").orElse(
      parameters.get("checkpointLocation").map { cp =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(cp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        "graft-sink-" + d.take(6).map(b => f"$b%02x").mkString
      })
      .getOrElse(throw new IllegalArgumentException(
        "graft streaming sink needs a stable dedup scope: set " +
          ".option(\"writerId\", ...) or a checkpointLocation"))
}
