package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.VectorQueries
import graft.sink.TxTable

/** The persisted IVF-PQ geometry contract (round 16): the index table
  * carries (m, ksub, dim) in its commit log, readers must validate
  * before decoding, and the build accepts any m dividing 64 — the
  * code-width knob SCALE.md's ladder measured is now a product
  * option, not a bench-only env var.
  */
class PqGeometrySpec extends AnyFunSuite {
  import TestSpark._

  private def freshTable(props: Seq[(String, String)]): String = {
    val t = java.nio.file.Files
      .createTempDirectory("graft_pqgeom").toString + "/idx"
    TxTable.createTable(spark, t, StructType(Seq(
      StructField("vec_id", LongType), StructField("cell_id", LongType),
      StructField("m", IntegerType), StructField("code", LongType),
      StructField("date", DateType))), props)
    t
  }

  test("an index without geometry properties refuses to serve") {
    val t = freshTable(Seq.empty)
    val e = intercept[IllegalStateException] {
      VectorQueries.requirePqGeometry(spark, t, expectM = 4)
    }
    assert(e.getMessage.contains("graft.pq.m"))
  }

  test("a geometry mismatch names both sides and refuses") {
    val t = freshTable(Seq("graft.pq.m" -> "32",
      "graft.pq.ksub" -> "16", "graft.pq.dim" -> "64"))
    val e = intercept[IllegalArgumentException] {
      VectorQueries.requirePqGeometry(spark, t, expectM = 4)
    }
    assert(e.getMessage.contains("m=32") && e.getMessage.contains("m=4"))
    // and the matching read succeeds, returning the persisted triple
    assert(VectorQueries.requirePqGeometry(spark, t, expectM = 32) ==
      ((32, 16, 64)))
  }

  test("m=32 build end-to-end: geometry persisted, replay no-op, " +
      "codes-only serve produces ranked neighbors") {
    // the driver gates prove m=4 and m=16 hash-for-hash vs DuckDB;
    // this pins the ladder's 300x winner (m=32 -> 2-dim subcodes)
    // through the same build/ingest/serve path at sf0.001
    val df = VectorQueries.ivfpqIncrBuild(32)(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("replay_noop")))
    val nVec = Tables.embeddings(spark, sf).count()
    assert(rows.forall(_.getAs[Long]("index_rows") == 32L * nVec))
    // every query id ranks 5 neighbors 1..5
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    }
  }
}
