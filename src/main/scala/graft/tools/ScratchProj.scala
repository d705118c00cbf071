package graft.tools
// throwaway profiler for the tx stage path — not product code
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
        .createTempDirectory("graft_stageprof").toString + "/t"
      t(s"append#$i")(TxTable.append(spark, summed, dir))
      t(s"zorder#$i")(TxTable.zorder(spark, dir,
        Seq("direction", "proto_name")))
    }
  }
}
