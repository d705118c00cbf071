package graft.tools
// throwaway profiler/debugger for the projection route — not product code
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.Projections
import graft.sink.{MaterializedView, TxFileIndex, TxTable}
import graft.sink.MaterializedView._

object ScratchProj {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_projdbg").toString
    val (baseT, mvT) = (s"$dir/base", s"$dir/mv")
    val mv = MvDef(Seq("date", "event_type"),
      Seq(SumState("cents", "cents"), CountState("n")))
    def d(s: String) = java.sql.Date.valueOf(s)
    TxTable.append(spark, Seq(
      (d("2024-03-01"), "view", 10L), (d("2024-03-01"), "click", 7L)
    ).toDF("date", "event_type", "cents"), baseT)
    println("refresh=" + MaterializedView.refresh(spark, baseT, mvT, mv))
    Projections.register(spark, baseT, mvT, mv)
    println("isCurrent=" + MaterializedView.isCurrent(spark, baseT, mvT))
    val q = TxFileIndex.readV2(spark, baseT).groupBy("event_type")
      .agg(sum("cents").as("cents"))
    println("=== analyzed ===\n" + q.queryExecution.analyzed)
    println("=== optimized ===\n" + q.queryExecution.optimizedPlan)
    q.collect().foreach(println)
    val ep = q.queryExecution.executedPlan
    println("=== executed class: " + ep.getClass.getSimpleName)
    val fin = ep match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    println("=== final ===\n" + fin)
    val scans = fin.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    println("scans=" + scans.size +
      " files=" + scans.flatMap(_.relation.location.inputFiles).mkString(","))
  }
}
