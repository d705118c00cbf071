package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, StringType,
  StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{TxFileIndex, TxTable}

/** Bucketed tx tables: `graft.bucketBy`/`graft.buckets` declared at
  * CREATE make every data write bucket at the [[TxTable.stage]] choke
  * point (Spark's own Murmur3-pmod placement, BucketingUtils-parseable
  * names), and the log-driven relation claims the HashPartitioning —
  * co-located joins/aggregations on the keys plan with no exchange.
  */
class BucketedTableSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_buckt_$tag").toString

  private val schema = StructType(Seq(
    StructField("date", DateType), StructField("k", LongType),
    StructField("v", StringType)))

  private def mk(tag: String, n: Int = 4): String = {
    val t = s"${tmp(tag)}/t"
    TxTable.createTable(spark, t, schema,
      Seq("graft.bucketBy" -> "k", "graft.buckets" -> n.toString))
    t
  }

  private def rows(r: Range, date: String = "2024-06-01") =
    r.map(i => (java.sql.Date.valueOf(date), i.toLong, s"v$i"))
      .toDF("date", "k", "v")

  test("placement invariant: every file parses a bucket id and holds " +
      "ONLY rows with hash(k) pmod n == its id; reads see everything") {
    val t = mk("place")
    TxTable.append(spark, rows(0 until 100), t)
    TxTable.append(spark, rows(100 until 160, "2024-06-02"), t)
    val files = TxTable.liveFiles(spark, t).keys.toSeq
    assert(files.nonEmpty)
    val ids = files.map { rel =>
      val id = org.apache.spark.sql.execution.datasources.BucketingUtils
        .getBucketId(new org.apache.hadoop.fs.Path(rel).getName)
      assert(id.isDefined, s"unbucketed staged file: $rel")
      rel -> id.get
    }.toMap
    ids.foreach { case (rel, b) =>
      val bad = spark.read.parquet(s"$t/$rel")
        .withColumn("__b", pmod(hash(col("k")), lit(4)))
        .filter(col("__b") =!= b).count()
      assert(bad == 0, s"$rel (bucket $b) holds foreign rows")
    }
    assert(TxFileIndex.readV2(spark, t).count() == 160)
  }

  test("the join and the aggregation on the bucket key plan with NO " +
      "exchange; bucket pruning serves a point lookup from one bucket") {
    val a = mk("joina", 4)
    val b = mk("joinb", 4)
    TxTable.append(spark, rows(0 until 200), a)
    TxTable.append(spark, rows(50 until 250)
      .withColumn("v", concat(lit("b"), col("v"))), b)

    val j = TxFileIndex.readV2(spark, a).hint("merge")
      .join(TxFileIndex.readV2(spark, b).withColumnRenamed("k", "k2")
        .withColumnRenamed("v", "v2").withColumnRenamed("date", "d2"),
        col("k") === col("k2"))
    val jp = j.queryExecution.executedPlan.toString
    assert(!jp.contains("Exchange"), jp.take(1000))
    assert(j.count() == 150)

    val agg = TxFileIndex.readV2(spark, a).groupBy("k")
      .agg(count(lit(1)).as("n"))
    val ap = agg.queryExecution.executedPlan.toString
    assert(!ap.contains("Exchange"), ap.take(1000))
    assert(agg.count() == 200)

    // bucket pruning: a point lookup reads ONE bucket's files. The
    // planner auto-disables bucketed scans when no operator needs the
    // distribution (DisableUnnecessaryBucketedScan) — pin it on for
    // the pruning assertion
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(autoKey)
    try {
      spark.conf.set(autoKey, "false")
      val point = TxFileIndex.readV2(spark, a).filter(col("k") === 7L)
      val pp = point.queryExecution.executedPlan.toString
      assert(pp.contains("SelectedBucketsCount: 1 out of 4"), pp.take(1000))
      assert(point.count() == 1)
    } finally spark.conf.set(autoKey, prev)
  }

  test("rewrite operators preserve the layout: DELETE and OPTIMIZE " +
      "stage bucketed files, and the join stays exchange-free after") {
    val t = mk("rw", 4)
    (0 until 3).foreach(i =>
      TxTable.append(spark, rows(i * 50 until (i + 1) * 50), t))
    assert(TxTable.delete(spark, t, col("k") % 10 === 3L) >= 0)
    TxTable.optimize(spark, t)
    val files = TxTable.liveFiles(spark, t).keys
    files.foreach { rel =>
      assert(org.apache.spark.sql.execution.datasources.BucketingUtils
        .getBucketId(new org.apache.hadoop.fs.Path(rel).getName).isDefined,
        s"rewrite produced unbucketed file $rel")
    }
    val agg = TxFileIndex.readV2(spark, t).groupBy("k")
      .agg(count(lit(1)).as("n"))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(agg.count() == 135)
  }

  test("guards: bucketing over existing unbucketed files refuses; a " +
      "write missing the key column refuses; the v2 streaming write " +
      "refuses a bucketed target; time travel to the pre-create era " +
      "is unaffected") {
    // declare-later refusal
    val plain = s"${tmp("plain")}/t"
    TxTable.append(spark, rows(0 until 10), plain)
    val e1 = intercept[IllegalArgumentException] {
      TxTable.setTableProperties(spark, plain,
        Seq("graft.bucketBy" -> "k", "graft.buckets" -> "4"))
    }
    assert(e1.getMessage.contains("existing"))

    // missing key column
    val t = mk("guard")
    val e2 = intercept[IllegalArgumentException] {
      TxTable.append(spark, rows(0 until 5)
        .withColumnRenamed("k", "notk"), t)
    }
    assert(e2.getMessage.contains("key column k"))

    // v2 streaming write refusal (the epoch-commit guard)
    TxTable.append(spark, rows(0 until 5), t)
    val e3 = intercept[IllegalArgumentException] {
      TxTable.commitStreamingEpoch(spark, t, "d-x", Set.empty,
        "w", 0L, schema)
    }
    assert(e3.getMessage.contains("BUCKETED"))
  }
}
