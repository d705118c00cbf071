package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Session-lifetime cache accounting for the query surface.
  *
  * Several text/dedup queries share expensive intermediates (the shingle
  * table, the boilerplate span table) across QUERIES — Spark's
  * CacheManager matches them by canonicalized plan, so the persist must
  * outlive any single query function. That reuse is deliberate; what was
  * missing was a release point: a long-lived session running the full
  * suite would otherwise hold every cached block forever. Every
  * suite-shared persist goes through [[track]] / [[trackRdd]], and the
  * harness (Verify / Bench / a spec) calls [[releaseAll]] once at the
  * end; storage memory returns to ~0 without giving up cross-query
  * sharing inside the run.
  */
object CacheRegistry {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
  private val rdds = scala.collection.mutable.ArrayBuffer.empty[RDD[_]]

  /** Persist `df` (idempotent under CacheManager plan matching) and
    * remember it for suite-end release.
    */
  def track[T](df: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] =
    synchronized {
      frames += df.persist(level)
      df
    }

  /** Remember a raw persisted RDD (e.g. the block cache behind an eager
    * localCheckpoint) for suite-end release.
    */
  def trackRdd(rdd: RDD[_]): Unit = synchronized { rdds += rdd }

  /** The block-manager RDD backing an eagerly localCheckpointed frame —
    * `Dataset.unpersist` does NOT free checkpoint blocks, so iterative
    * algorithms must release these explicitly once consumed.
    */
  def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Free a consumed localCheckpoint's blocks right away (used between
    * rounds of iterative propagation, where waiting for suite-end would
    * accumulate one cached copy of the label table per round).
    */
  def freeCheckpoint(df: DataFrame): Unit =
    checkpointRdd(df).foreach(_.unpersist(blocking = false))

  /** Release every tracked cache; storage memory returns to ~0. */
  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
    rdds.foreach(_.unpersist(blocking = false))
    rdds.clear()
  }
}
