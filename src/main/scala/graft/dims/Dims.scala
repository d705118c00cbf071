package graft.dims

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-snapshot utilities. */
object Dims {

  /** J6 multi-watcher chain (labeler.go:198-232): the reference walks an
    * ordered list of cluster watchers and takes the first non-nil match.
    * Relationally: union the snapshots with their priority and keep the
    * top-1 per key — one broadcastable dim table instead of N sequential
    * lookups.
    */
  def firstMatchByPriority(dims: Seq[DataFrame], key: String): DataFrame = {
    require(dims.nonEmpty)
    val tagged = dims.zipWithIndex.map { case (d, i) =>
      d.withColumn("__prio", lit(i))
    }
    val all = tagged.reduce(_ unionByName _)
    val w = Window.partitionBy(key).orderBy(col("__prio"))
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__prio")
  }
}
