package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RewriteIpPredicates
import graft.functions.ipfns._

/** The RewriteIpPredicates optimizer rule must (a) preserve semantics
  * and (b) turn `ip_is_private(col)` filters into range predicates the
  * parquet source can push down.
  */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("rule rewrites ip_is_private into pushable range predicates") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteIpPredicates
    try {
      val li = Tables.lineitem(spark, sf)
      val df = li.filter(ip_is_private(col("l_orderkey")))
        .select("l_orderkey")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // black box gone, ranges pushed into the scan
      assert(!plan.contains("ip_is_private"), plan.take(1500))
      assert(plan.contains("PushedFilters: [") &&
        plan.contains("GreaterThanOrEqual(l_orderkey"), plan.take(1500))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == RewriteIpPredicates)
    }
  }

  test("rewrite preserves semantics against the unrewritten expression") {
    val ips = Seq(167772160L, 184549375L, 184549376L, 2886729727L,
      2886729728L, 2887778304L, 3232235520L, 2130706433L, 2851995648L,
      16777216L, 0L, 4294967295L)
    import spark.implicits._
    val df = ips.toDF("ip")
    val plain = df.select(col("ip"), ip_is_private(col("ip")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteIpPredicates
    try {
      val rewritten = df.select(col("ip"), ip_is_private(col("ip")).as("p"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(rewritten == plain)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == RewriteIpPredicates)
    }
  }
}
