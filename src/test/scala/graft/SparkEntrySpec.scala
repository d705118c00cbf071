package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class SparkEntrySpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle or is rows-only, and runs") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(s"query $name:") { assert(n >= 0) }
    }
  }

  test("q1_agg groups to the 6 returnflag/linestatus combos") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 9)
    val qty = rows.map(_.getAs[Long]("sum_qty")).sum
    assert(qty > 0)
  }

  test("q9_fanout doubles the row count (direction fan-out invariant)") {
    val li = Tables.lineitem(spark, sf).count()
    val fanned = SparkEntry.queries("q9_fanout")(spark, sf).count()
    assert(fanned == 2 * li)
  }
}
