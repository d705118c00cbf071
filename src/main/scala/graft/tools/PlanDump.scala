package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway plan printer (not part of the driver contract): dumps the
  * final adaptive plan of named queries for join/exchange inspection.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val full = df.queryExecution.executedPlan.toString
      val cut = full.indexOf("== Initial Plan ==")
      val p = if (cut >= 0) full.substring(0, cut) else full
      println(s"===== $name =====")
      println(p)
    }
    graft.ops.CacheRegistry.releaseAll()
    spark.stop()
  }
}
