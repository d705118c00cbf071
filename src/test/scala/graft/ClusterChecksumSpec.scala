package graft

import org.scalatest.funsuite.AnyFunSuite

/** The multi-executor proof as a STANDING gate: [[graft.tools.ClusterBench]]
  * runs the flow pipeline, minhash banding, and the tx append/merge
  * round trip in a child JVM twice — once on `local[4]` (single JVM)
  * and once on `local-cluster[2,4,1200]` (a real standalone master
  * whose workers FORK separate executor JVMs) — and this spec asserts
  * the two runs' per-step row counts and content checksums are
  * IDENTICAL. Single-JVM suites can never falsify closure/broadcast
  * serialization (the driver-built LPM trie travels by reference) or
  * real network shuffle; this can, on every `sbt test`.
  */
class ClusterChecksumSpec extends AnyFunSuite {
  private val addOpens = graft.tools.Jdk17Opens.flags

  /** Run ClusterBench in a child JVM against `master`; returns the
    * (step, rows, checksum) triples, or Left(diagnostic) on an exit-137
    * OOM kill (retryable environment condition).
    */
  private def run(master: String, out: java.io.File,
      log: java.io.File): Either[String, Seq[(String, Long, Long)]] = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd: Seq[String] = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-XX:ActiveProcessorCount=8",
      "-Dspark.ui.enabled=false",
      "graft.tools.ClusterBench", master)
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("CLASSPATH", System.getProperty("java.class.path"))
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.environment().put("SPARK_GRAFT_SF_DIR", TestSpark.sf)
    pb.environment().put("SPARK_GRAFT_CLUSTER_OUT", out.getAbsolutePath)
    // executors forked by local-cluster workers inherit nothing from
    // -Xmx2g above; ClusterBench itself passes them extraClassPath +
    // add-opens and the 1200 MB cap rides in the master string
    pb.redirectOutput(log)
    pb.redirectErrorStream(true)
    val p = pb.start()
    assert(p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS),
      { p.destroyForcibly(); s"ClusterBench($master) timed out" })
    if (p.exitValue() == 137)
      return Left(s"ClusterBench($master) SIGKILLed (137)")
    assert(p.exitValue() == 0,
      s"ClusterBench($master) failed (exit ${p.exitValue()}):\n" +
        scala.io.Source.fromFile(log).getLines().toSeq.takeRight(30)
          .mkString("\n"))
    val json = scala.io.Source.fromFile(out).mkString
    val step = "\"step\":\"(\\w+)\",\"sec\":[0-9.]+,\"rows\":(\\d+),\"checksum\":(-?\\d+)".r
    Right(step.findAllMatchIn(json)
      .map(m => (m.group(1), m.group(2).toLong, m.group(3).toLong)).toSeq)
  }

  test("local-cluster (separate executor JVMs) produces row counts and " +
      "content checksums identical to single-JVM execution") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_clusterck").toFile
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      val a = run("local[4]",
        new java.io.File(dir, s"local_$attempt.json"),
        new java.io.File(dir, s"local_$attempt.log"))
      val b = run("local-cluster[2,4,1200]",
        new java.io.File(dir, s"mc_$attempt.json"),
        new java.io.File(dir, s"mc_$attempt.log"))
      (a, b) match {
        case (Right(loc), Right(mc)) =>
          assert(loc.size == 6 && mc.size == 6,
            s"expected 6 steps, got ${loc.size}/${mc.size}")
          loc.zip(mc).foreach { case ((s1, r1, c1), (s2, r2, c2)) =>
            assert(s1 == s2, s"step order diverged: $s1 vs $s2")
            assert(r1 == r2,
              s"$s1: row count diverged across JVM boundary ($r1 vs $r2)")
            assert(c1 == c2,
              s"$s1: CONTENT diverged across the executor-JVM " +
                s"boundary ($c1 vs $c2) — broadcast/closure " +
                "serialization or shuffle is corrupting rows")
          }
          done = true
        case _ =>
          // exit-137 = the sandbox OOM reaper under full-suite load;
          // retry on a bounded budget rather than failing the gate for
          // environmental reasons
          assert(attempt < 3,
            s"child JVMs OOM-killed in $attempt consecutive attempts")
      }
    }
  }
}
