package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{TxFileIndex, TxTable}

/** Dynamic partition pruning through the LOG-DRIVEN file index: a
  * dim-side selective filter prunes the fact scan's date partitions AT
  * RUNTIME (the classic star-schema move — at 100 TB the difference
  * between scanning one day and scanning the table). TxFileIndex's
  * `listFiles` evaluates the planner's partition filters, including
  * the executed `DynamicPruningExpression`, so the stock DPP rule
  * needs no adapter. Caveat pinned here because it cost the round-11
  * investigation an hour: the dim must be a REAL relation — a
  * LocalRelation dim's filter constant-folds away before the DPP rule
  * looks for a selective predicate, and no pruning happens (same for
  * stock parquet).
  */
class DppSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("a dim filter runtime-prunes the tx fact scan to one date " +
      "partition") {
    val t = java.nio.file.Files.createTempDirectory("graft_dpp")
      .toString + "/t"
    val rows = (1 to 8).flatMap(dd => (1 to 200).map(i =>
      (java.sql.Date.valueOf(f"2024-06-0$dd"), i.toLong, s"v$i")))
    TxTable.append(spark, rows.toDF("date", "k", "v"), t)
    val ddir = java.nio.file.Files.createTempDirectory("graft_dpp_dim")
      .toString
    (1 to 8).map(dd => (java.sql.Date.valueOf(f"2024-06-0$dd"),
      if (dd == 3) "pick" else s"other$dd")).toDF("ddate", "tag")
      .write.mode("overwrite").parquet(ddir)
    val dim = spark.read.parquet(ddir)

    val j = TxFileIndex.readV2(spark, t)
      .join(dim, col("date") === col("ddate"))
      .filter(col("tag") === "pick")
    // execute THIS plan so its scan metrics land (count() would build
    // a separate query execution)
    assert(j.collect().length == 200)

    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case other => other.children.flatMap(scans) ++ (other match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case _ => Nil })
    }
    val fact = scans(j.queryExecution.executedPlan)
      .find(_.relation.location.isInstanceOf[TxFileIndex]).get
    assert(fact.partitionFilters.exists(
      _.toString.contains("dynamicpruning")),
      fact.partitionFilters.mkString(";"))
    assert(fact.metrics("numFiles").value == 1,
      s"runtime pruning must scan ONE of 8 date partitions, " +
        s"got ${fact.metrics("numFiles").value}")
  }
}
