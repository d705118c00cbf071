package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{TxFileIndex, TxTable}

/** CLONE TABLE + ATTACH PARTITION FROM: metadata-only snapshots across
  * table roots — absolute-path file references, absolutized skip-index
  * pointers, independent logs from v0, and the documented
  * source-vacuum caveat.
  */
class CloneSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_clone_$tag").toString

  private def rows(r: Range, date: String = "2024-06-01") =
    r.map(i => (java.sql.Date.valueOf(date), i.toLong, s"v$i"))
      .toDF("date", "k", "v")

  private def dataDirs(t: String): Seq[String] =
    Option(new java.io.File(t).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("d-"))
      .map(_.getName).toSeq

  test("shallow clone: zero data I/O, content-identical, independent " +
      "evolution both ways, skip indexes keep pruning across roots") {
    val src = s"${tmp("src")}/t"
    TxTable.append(spark, rows(0 until 50), src)
    TxTable.append(spark, rows(50 until 90, "2024-06-02"), src)
    val cl = s"${tmp("dst")}/t"
    val v = TxTable.cloneTable(spark, src, cl)
    assert(v == 0L)
    assert(dataDirs(cl).isEmpty, "shallow clone must write NO data files")
    assert(TxFileIndex.readV2(spark, cl).count() == 90)

    // independence: source append invisible to the clone; clone
    // delete invisible to the source
    TxTable.append(spark, rows(90 until 100), src)
    assert(TxFileIndex.readV2(spark, src).count() == 100)
    assert(TxFileIndex.readV2(spark, cl).count() == 90)
    assert(TxTable.delete(spark, cl, col("k") < 10L) >= 0)
    assert(TxFileIndex.readV2(spark, cl).count() == 80)
    assert(TxFileIndex.readV2(spark, src).count() == 100,
      "clone mutations must never touch the source")

    // the clone's vacuum walks only its own root — the foreign files
    // the delete rewrote away must survive for the source
    TxTable.vacuum(spark, cl, minAgeMs = 0L)
    assert(TxFileIndex.readV2(spark, src).count() == 100)

    // date partition pruning still plans from the clone's log
    val pruned = TxFileIndex.readV2(spark, cl)
      .filter(col("date") === lit(java.sql.Date.valueOf("2024-06-02")))
    pruned.collect()
    assert(pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head.metrics("numFiles").value < TxTable.liveFiles(spark, cl).size)
  }

  test("clone AS OF pins a historical version; deep clone materializes " +
      "its own bytes; cloning onto an existing table refuses") {
    val src = s"${tmp("asof")}/t"
    TxTable.append(spark, rows(0 until 30), src)
    val v1 = TxTable.currentVersion(spark, src)
    TxTable.append(spark, rows(30 until 60), src)

    val cOld = s"${tmp("asofdst")}/t"
    TxTable.cloneTable(spark, src, cOld, asOf = Some(v1))
    assert(TxFileIndex.readV2(spark, cOld).count() == 30)

    val cDeep = s"${tmp("deep")}/t"
    TxTable.cloneTable(spark, src, cDeep, shallow = false)
    assert(dataDirs(cDeep).nonEmpty, "deep clone owns its bytes")
    assert(TxFileIndex.readV2(spark, cDeep).count() == 60)

    val e = intercept[IllegalArgumentException] {
      TxTable.cloneTable(spark, src, cOld)
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("shallow clone refuses live deletion vectors, naming the remedy") {
    val src = s"${tmp("dv")}/t"
    TxTable.append(spark, rows(0 until 40), src)
    assert(TxTable.deleteMergeOnRead(spark, src, col("k") === 5L) > 0)
    val e = intercept[IllegalArgumentException] {
      TxTable.cloneTable(spark, src, s"${tmp("dvdst")}/t")
    }
    assert(e.getMessage.contains("purge"))
    // deep clone applies the vectors instead
    val deep = s"${tmp("dvdeep")}/t"
    TxTable.cloneTable(spark, src, deep, shallow = false)
    assert(TxFileIndex.readV2(spark, deep).count() == 39)
  }

  test("attach partition from: one date joins by reference, schemas " +
      "must agree additively, missing dates refuse") {
    val src = s"${tmp("apsrc")}/t"
    TxTable.append(spark, rows(0 until 20, "2024-06-01"), src)
    TxTable.append(spark, rows(20 until 50, "2024-06-02"), src)
    val dst = s"${tmp("apdst")}/t"
    TxTable.append(spark, rows(100 until 110, "2024-06-03"), dst)
    assert(TxTable.attachPartitionFrom(spark, src, dst, "2024-06-02") > 0)
    assert(dataDirs(dst).size == 1, "attach writes no data files")
    assert(TxFileIndex.readV2(spark, dst).count() == 40)
    assert(TxFileIndex.readV2(spark, src).count() == 50,
      "ATTACH FROM copies by reference; the source keeps its partition")

    intercept[IllegalArgumentException] {
      TxTable.attachPartitionFrom(spark, src, dst, "2030-01-01")
    }
    // REPLACE PARTITION: the target's own 06-03 rows leave in the
    // same commit the source's arrive... (no 06-03 in src, so replace
    // its 06-02 instead: target's attached copy swaps atomically)
    TxTable.append(spark, rows(200 until 203, "2024-06-02"), dst)
    assert(TxFileIndex.readV2(spark, dst)
      .filter(col("date") === "2024-06-02").count() == 33)
    assert(TxTable.attachPartitionFrom(spark, src, dst, "2024-06-02",
      replace = true) > 0)
    assert(TxFileIndex.readV2(spark, dst)
      .filter(col("date") === "2024-06-02").count() == 30,
      "REPLACE PARTITION swaps the whole date to the source's state")

    // DROP PARTITION: one metadata commit, the date vanishes, the
    // rest survives; a dateless drop is a no-op (-1, no commit churn)
    val vBefore = TxTable.currentVersion(spark, dst)
    assert(TxTable.dropPartition(spark, dst, "2024-06-02") > vBefore)
    assert(TxFileIndex.readV2(spark, dst)
      .filter(col("date") === "2024-06-02").count() == 0)
    assert(TxFileIndex.readV2(spark, dst).count() == 10,
      "the other dates survive the drop")
    assert(TxTable.dropPartition(spark, dst, "2030-01-01") == -1L)
    assert(TxTable.currentVersion(spark, dst) == vBefore + 1)
    val odd = s"${tmp("apodd")}/t"
    TxTable.append(spark,
      Seq((java.sql.Date.valueOf("2024-06-01"), 1L, 2.5))
        .toDF("date", "k", "v"), odd)
    val e = intercept[IllegalArgumentException] {
      TxTable.attachPartitionFrom(spark, src, odd, "2024-06-01")
    }
    assert(e.getMessage.contains("conflict"))
  }

  test("SQL surface: CALL gcat.sys.clone and attach_partition") {
    spark.conf.set("spark.sql.catalog.gcat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat.warehouse",
      sys.props("java.io.tmpdir") + "/graft_gcat_warehouse")
    spark.sql("DROP NAMESPACE IF EXISTS gcat.cln CASCADE")
    spark.sql("CREATE NAMESPACE gcat.cln")
    spark.sql("CREATE TABLE gcat.cln.s (date DATE, k BIGINT)")
    spark.sql("INSERT INTO gcat.cln.s SELECT id, DATE'2024-06-01'" +
      " FROM range(25)")
    spark.sql("CALL gcat.sys.clone(source => 'cln.s', target => 'cln.t')")
    assert(spark.sql("SELECT count(*) FROM gcat.cln.t")
      .head.getLong(0) == 25)
    spark.sql("CREATE TABLE gcat.cln.u (date DATE, k BIGINT)")
    spark.sql("CALL gcat.sys.attach_partition(source => 'cln.s'," +
      " target => 'cln.u', date => '2024-06-01')")
    assert(spark.sql("SELECT count(*) FROM gcat.cln.u")
      .head.getLong(0) == 25)

    // system.parts analog: one row per live file, from the log
    val parts = spark.sql("CALL gcat.sys.parts(table => 'cln.u')")
      .collect()
    assert(parts.nonEmpty)
    assert(parts.forall(_.getAs[String]("date") == "2024-06-01"))
    assert(parts.forall(_.getAs[Long]("bytes") > 0))
    // the attached file is a foreign absolute reference
    assert(parts.exists(_.getAs[String]("file").contains("cln/s/")))

    // drop_partition: the date vanishes in one metadata commit
    assert(spark.sql("CALL gcat.sys.drop_partition(table => 'cln.u'," +
      " date => '2024-06-01')").head.getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM gcat.cln.u")
      .head.getLong(0) == 0)
    assert(spark.sql("CALL gcat.sys.drop_partition(table => 'cln.u'," +
      " date => '2030-01-01')").head.getLong(0) == -1L)
  }
}
