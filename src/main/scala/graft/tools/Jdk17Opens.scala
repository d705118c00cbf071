package graft.tools

/** The JDK-17 `--add-opens` set Spark 4 needs when a SparkSession is
  * created outside spark-submit — ONE definition for every child-JVM
  * launcher (ClusterBench's forked executors, the cross-JVM race
  * writers, the cluster-checksum children). Matches
  * `org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions()`
  * and the list in build.sbt (which cannot import project classes and
  * must stay in sync by hand — it is the fourth copy by necessity,
  * not choice).
  */
object Jdk17Opens {
  val packages: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")

  /** Argument-vector form for ProcessBuilder launches. */
  val flags: Seq[String] =
    packages.flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Single-string form for `spark.executor.extraJavaOptions`. */
  val asJavaOptions: String =
    packages.map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
}
