package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.flow.{FlowConfig, FlowPipeline, SyntheticFlows}
import graft.sink.{TxTable, TxFileIndex}

/** Throwaway phase profiler for the tx gates (not part of the contract). */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val s = spark
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      val (f, p, n, px) = (SyntheticFlows.flows(s, d), SyntheticFlows.pods(s, d),
        SyntheticFlows.nodes(s, d), SyntheticFlows.prefixes(s, d))
      val summed = FlowPipeline.run(f, p, n, px, FlowConfig()).persist()
      t("pipeline+persist") { summed.count() }
      val base = sys.props("java.io.tmpdir") + "/graft_scratch2"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
      val table = s"$base/t"
      t("append") { TxTable.append(s, summed, table) }
      val b = t("cut agg") { summed.agg(
        min(unix_micros(col("interval_start"))).as("lo"),
        max(unix_micros(col("interval_start"))).as("hi")).collect().head }
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
      t("merge") { TxTable.merge(s, upd.unionByName(ins), table, keys) }
      t("read+sort+noop") {
        TxTable.read(s, table)
          .select(summed.columns.map(col): _*)
          .orderBy("date", "interval_start", "direction")
          .write.mode("overwrite").format("noop").save()
      }
      println("files: " + TxTable.liveFiles(s, table).size)
      t("zorder") { TxTable.zorder(s, table, Seq("direction", "proto_name")) }
      println("files after zorder: " + TxTable.liveFiles(s, table).size)
      t("zorder read") {
        TxFileIndex.readV2(s, table)
          .filter(col("proto_name") === "tcp")
          .groupBy("direction", "proto_name")
          .agg(sum("bytes").as("bytes"))
          .write.mode("overwrite").format("noop").save()
      }
      summed.unpersist()
    }
    spark.stop()
  }
}
