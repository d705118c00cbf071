package graft.tools
// throwaway profiler for the tx merge path — not product code
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.flow.{FlowConfig, FlowPipeline, SyntheticFlows}
import graft.sink.TxTable

object ScratchProj {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val summed = FlowPipeline.run(SyntheticFlows.flows(spark, d),
      SyntheticFlows.pods(spark, d), SyntheticFlows.nodes(spark, d),
      SyntheticFlows.prefixes(spark, d), FlowConfig()).cache()
    println("rows=" + summed.count())
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$l%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to 2).foreach { i =>
      val dir = java.nio.file.Files
        .createTempDirectory("graft_mergeprof").toString + "/t"
      t(s"append#$i")(TxTable.append(spark, summed, dir))
      val b = summed.agg(
        min(unix_micros(col("interval_start"))).as("lo"),
        max(unix_micros(col("interval_start"))).as("hi")).collect().head
      val cut = b.getLong(0) + 2L * (b.getLong(1) - b.getLong(0)) / 3L
      val upd = summed
        .filter(unix_micros(col("interval_start")) >= cut)
        .withColumn("bytes", col("bytes") * 2)
        .withColumn("packets", col("packets") * 2)
      val ins = upd
        .withColumn("interval_start",
          col("interval_start") + expr("INTERVAL 30 DAYS"))
        .withColumn("date", date_add(col("date"), 30))
      val keys = summed.columns.toSeq
        .filterNot(Set("bytes", "packets", "n_obs"))
      t(s"merge#$i")(TxTable.merge(spark, upd.unionByName(ins), dir, keys))
      t(s"readback#$i")(TxTable.read(spark, dir).count())
    }
  }
}
