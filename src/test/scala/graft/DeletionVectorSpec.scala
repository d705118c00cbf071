package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sink.{DvStore, TxTable}

/** Merge-on-read deletion vectors (Dv.scala, DvParquetFileFormat,
  * TxTable.deleteMergeOnRead/purgeDeletes): a row-level DELETE that
  * writes O(matched rows) of sidecar instead of rewriting files, with
  * scans subtracting positions at read time.
  */
class DeletionVectorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def freshTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** (rel -> (bytes, dv pointer min)) of the live snapshot. */
  private def liveShape(path: String): Map[String, (Long, Option[String])] =
    TxTable.liveStats(spark, path).map { case (rel, m) =>
      rel -> (m.bytes, DvStore.pointerOf(m.stats))
    }

  test("encode/decode/union round-trip sorted positions") {
    val cases = Seq(
      Array.empty[Long], Array(0L), Array(0L, 1L, 2L),
      Array(5L, 100L, 1L << 40), (0L until 1000L by 7).toArray)
    cases.foreach { ps =>
      assert(DvStore.decode(DvStore.encode(ps)).toSeq == ps.toSeq)
    }
    assert(DvStore.union(Array(1L, 5L, 9L), Array(0L, 5L, 10L)).toSeq ==
      Seq(0L, 1L, 5L, 9L, 10L))
    assert(DvStore.union(Array.empty[Long], Array(3L)).toSeq == Seq(3L))
  }

  test("merge-on-read delete: data files untouched, reads subtract, " +
    "second delete unions, purge materializes") {
    val path = freshTable("graft_dv")
    def rows(lo: Int, hi: Int) = (lo until hi)
      .map(i => (d("2024-03-01"), i.toLong, s"k$i")).toDF("date", "v", "k")
    TxTable.append(spark, rows(0, 40), path)
    TxTable.append(spark, rows(40, 80), path)
    val before = liveShape(path)
    assert(before.nonEmpty)

    // ONE metadata commit; not a single data file rewritten
    val v1 = TxTable.deleteMergeOnRead(spark, path, col("v") % 10 === 3)
    assert(v1 > 0)
    val after = liveShape(path)
    assert(after.keySet == before.keySet,
      "merge-on-read must keep the exact data file identities")
    after.foreach { case (rel, (bytes, ptr)) =>
      assert(bytes == before(rel)._1, s"$rel rewritten — bytes changed")
    }
    assert(after.values.exists(_._2.isDefined), "some file carries a DV")

    val got1 = TxTable.read(spark, path).select("v")
      .as[Long].collect().sorted.toSeq
    assert(got1 == (0L until 80L).filterNot(_ % 10 == 3).sorted,
      "reads subtract the deletion vector")

    // no-match delete commits nothing
    assert(TxTable.deleteMergeOnRead(spark, path, col("v") === 999L) == -1L)

    // overlapping second delete UNIONS positions into one pointer
    val v2 = TxTable.deleteMergeOnRead(spark, path,
      col("v") % 10 === 3 || col("v") % 10 === 7)
    assert(v2 > v1)
    val got2 = TxTable.read(spark, path).select("v")
      .as[Long].collect().sorted.toSeq
    val expect2 = (0L until 80L)
      .filterNot(x => x % 10 == 3 || x % 10 == 7).sorted
    assert(got2 == expect2)
    val shape2 = liveShape(path)
    assert(shape2.keySet == before.keySet, "still no data rewrite")
    shape2.values.flatMap(_._2).foreach(ptr =>
      assert(ptr.startsWith("@"), "pointer-form DV entries"))

    // aggregates and filters over the vectored table stay correct
    assert(TxTable.read(spark, path).agg(sum("v")).collect().head
      .getLong(0) == expect2.sum)
    assert(TxTable.read(spark, path).filter(col("v") < 10)
      .count() == expect2.count(_ < 10))

    // time travel reads each era's vector state
    assert(TxTable.read(spark, path, asOfVersion = Some(v1 - 1))
      .count() == 80, "pre-delete era sees every row")
    assert(TxTable.read(spark, path, asOfVersion = Some(v1))
      .select("v").as[Long].collect().sorted.toSeq == got1,
      "first-delete era sees only its own vector")

    // purge rewrites ONLY vectored files, drops the pointers, keeps
    // the row multiset, and is layout-class (MV stays fresh)
    val vPurge = TxTable.purgeDeletes(spark, path)
    assert(vPurge > v2)
    val shape3 = liveShape(path)
    assert(shape3.values.forall(_._2.isEmpty), "no pointer survives purge")
    assert(TxTable.read(spark, path).select("v")
      .as[Long].collect().sorted.toSeq == expect2,
      "purge is content-preserving")
    assert(TxTable.purgeDeletes(spark, path) == -1L,
      "second purge is a no-op")
    // history records the op tags
    val hist = TxTable.history(spark, path)
      .select("version", "operation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hist(v1) == "delete-mor" && hist(v2) == "delete-mor")
    assert(hist(vPurge) == "purge")
  }

  test("a file whose every row is deleted is removed, not vectored") {
    val path = freshTable("graft_dvfull")
    def rows(date: String, lo: Int, hi: Int) = (lo until hi)
      .map(i => (d(date), i.toLong)).toDF("date", "v")
    TxTable.append(spark, rows("2024-03-01", 0, 10), path)
    TxTable.append(spark, rows("2024-03-02", 10, 20), path)
    val before = liveShape(path)
    val v = TxTable.deleteMergeOnRead(spark, path,
      col("date") === lit(d("2024-03-01")))
    assert(v > 0)
    val after = liveShape(path)
    assert(after.size < before.size, "fully-deleted files dropped")
    assert(after.values.forall(_._2.isEmpty),
      "no vector needed when the whole file goes")
    assert(TxTable.read(spark, path).select("v")
      .as[Long].collect().sorted.toSeq == (10L until 20L))
  }

  test("copy-on-write ops on vectored files never resurrect: " +
    "delete/merge/compact read through the vector") {
    val path = freshTable("graft_dvcow")
    val rows = (0 until 60)
      .map(i => (d("2024-03-01"), i.toLong, (i % 3).toString))
      .toDF("date", "v", "k")
    TxTable.append(spark, rows, path)
    assert(TxTable.deleteMergeOnRead(spark, path, col("v") < 20) > 0)
    // copy-on-write DELETE on the SAME file: rewrite must not bring
    // the vectored rows back
    assert(TxTable.delete(spark, path, col("v") >= 50) > 0)
    val got = TxTable.read(spark, path).select("v")
      .as[Long].collect().sorted.toSeq
    assert(got == (20L until 50L), s"resurrection check failed: $got")
    assert(liveShape(path).values.forall(_._2.isEmpty),
      "the rewrite replaced the vectored file — pointer gone with it")
  }

  test("merge-on-read UPDATE: one commit vectors the pre-images and " +
    "appends the post-images; the feed reads delete+insert") {
    val path = freshTable("graft_dvupd")
    val rows = (0 until 50)
      .map(i => (d("2024-03-01"), i.toLong, s"k${i % 5}"))
      .toDF("date", "v", "k")
    TxTable.append(spark, rows, path)
    val before = liveShape(path)
    val v1 = TxTable.updateMergeOnRead(spark, path, col("v") < 10,
      Seq("v" -> (col("v") + 1000L)))
    assert(v1 == 1L)
    val after = liveShape(path)
    assert(before.keySet.subsetOf(after.keySet),
      "original data files keep their identity (vectored, not rewritten)")
    before.foreach { case (rel, (bytes, _)) =>
      assert(after(rel)._1 == bytes, s"$rel rewritten")
    }
    assert(after.size > before.size, "post-image files appended")
    val got = TxTable.read(spark, path).select("v")
      .as[Long].collect().sorted.toSeq
    val expect = ((10L until 50L) ++ (0L until 10L).map(_ + 1000L)).sorted
    assert(got == expect)
    // no-match update commits nothing
    assert(TxTable.updateMergeOnRead(spark, path, col("v") === -1L,
      Seq("v" -> lit(0L))) == -1L)
    // the feed derives delete(pre) + insert(post) from the commit
    val feed = TxTable.changeFeed(spark, path, v1 - 1, v1)
      .select(col("_change_type"), col("v")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val dels = feed.filter(_._1 == "delete").map(_._2).sorted.toSeq
    val ins = feed.filter(_._1 == "insert").map(_._2).sorted.toSeq
    assert(dels == (0L until 10L), s"pre-images: $dels")
    assert(ins == (0L until 10L).map(_ + 1000L), s"post-images: $ins")
  }

  test("changeFeed on merge-on-read commits: exactly the newly deleted " +
    "rows, per era; purge is silent") {
    val path = freshTable("graft_dvcdf")
    val rows = (0 until 30)
      .map(i => (d("2024-03-01"), i.toLong)).toDF("date", "v")
    TxTable.append(spark, rows, path)
    val v1 = TxTable.deleteMergeOnRead(spark, path, col("v") < 5)
    val v2 = TxTable.deleteMergeOnRead(spark, path,
      col("v") < 8) // overlaps: only 5,6,7 newly deleted
    val vP = TxTable.purgeDeletes(spark, path)
    val feed = TxTable.changeFeed(spark, path, v1 - 1, vP)
      .select(col("_commit_version"), col("_change_type"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val at1 = feed.filter(_._1 == v1)
    assert(at1.forall(_._2 == "delete") &&
      at1.map(_._3).sorted.toSeq == (0L until 5L),
      s"first vector's feed: ${at1.toSeq}")
    val at2 = feed.filter(_._1 == v2)
    assert(at2.forall(_._2 == "delete") &&
      at2.map(_._3).sorted.toSeq == Seq(5L, 6L, 7L),
      "second vector announces ONLY its newly deleted rows")
    assert(!feed.exists(_._1 == vP), "purge is layout-class: silent")
  }

  test("deletion vectors are correctness-critical: a missing sidecar " +
    "fails the read loudly instead of resurrecting rows") {
    val path = freshTable("graft_dvstrict")
    TxTable.append(spark,
      (0 until 10).map(i => (d("2024-03-01"), i.toLong)).toDF("date", "v"),
      path)
    assert(TxTable.deleteMergeOnRead(spark, path, col("v") === 0L) > 0)
    // even zero-retention vacuum protects the LIVE sidecar (it may
    // sweep write markers like _SUCCESS — that is fine)
    assert(!TxTable.vacuum(spark, path, 0L).exists(_.endsWith("_dv.tsv")),
      "zero-retention vacuum must still protect the LIVE sidecar")
    assert(TxTable.read(spark, path).count() == 9)
    // destroy the sidecar out-of-band → strict failure
    val sidecar = TxTable.liveStats(spark, path).values
      .flatMap(m => DvStore.pointerOf(m.stats)).head.stripPrefix("@")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root, sidecar), false)
    DvStore.clearCache()
    intercept[Exception] { TxTable.read(spark, path).count() }
  }

  test("concurrent vector CAS: a stale writer's commit aborts instead " +
    "of overwriting the landed vector") {
    val path = freshTable("graft_dvcas")
    TxTable.append(spark,
      (0 until 20).map(i => (d("2024-03-01"), i.toLong)).toDF("date", "v"),
      path)
    // simulate the race via the ops seam: a writer that read the
    // pre-vector state tries to land ITS vector after another vector
    // already committed — the CAS must abort it
    val rel = TxTable.liveStats(spark, path).keys.head
    assert(TxTable.deleteMergeOnRead(spark, path, col("v") === 1L) > 0)
    val ex = intercept[IllegalArgumentException] {
      TxTable.commitDvForTest(spark, path, rel, Array(2L),
        expectPtr = None)
    }
    assert(ex.getMessage.contains("deletion vector"),
      s"wrong failure: ${ex.getMessage}")
  }
}
