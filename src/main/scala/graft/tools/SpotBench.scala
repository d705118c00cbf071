package graft.tools
import org.apache.spark.sql.SparkSession
object SpotBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    run(graft.SparkEntry.queries("q1_agg")(spark, sfDir)) // warmup
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); run(fn(spark, sfDir)); (System.nanoTime()-t0)/1e9 }
      println(f"[spot] $name%-24s min=${times.min}%6.2f s  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    graft.ops.CacheRegistry.releaseAll()
    spark.stop()
  }
}
