package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, StringType,
  StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{Bloom, TxFileIndex, TxTable}

/** ngram Bloom skip index (ClickHouse `ngrambf_v1` analog, opt-in via
  * `graft.ngramBloomBy`): per-file 4-gram filters over declared string
  * columns, probed at PLANNING time by substring predicates
  * (Contains/StartsWith/EndsWith — the shapes LIKE simplifies to).
  * A file is skipped when any 4-gram of the literal is provably
  * absent; literals shorter than one gram scan everything, like CH.
  */
class NgramBloomSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("LIKE '%needle%' skips to the exact may-contain set; prefix and " +
      "suffix predicates probe too; short literals scan all; no false " +
      "negatives") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_txngram").toString + "/t"
    TxTable.createTable(spark, path, StructType(Seq(
      StructField("date", DateType), StructField("doc_id", LongType),
      StructField("text", StringType))),
      Seq("graft.ngramBloomBy" -> "text"))
    // disjoint content words per append → substring membership
    // partitions the file set
    Seq(Seq("the alphaword document", "another alphaword text"),
      Seq("the gammaword document", "another gammaword text"),
      Seq("the epsilonword document", "another epsilonword text"))
      .zipWithIndex.foreach { case (texts, i) =>
        TxTable.append(spark, texts.zipWithIndex.map { case (t, j) =>
          (java.sql.Date.valueOf("2024-03-01"), (i * 10 + j).toLong, t)
        }.toDF("date", "doc_id", "text"), path)
      }
    val metas = TxTable.liveStatsResolved(spark, path)
    assert(metas.size >= 3 &&
      metas.values.forall(_.stats.get("text#ng").exists(_.typ == 'b')))
    assert(TxTable.liveStats(spark, path).values.forall { m =>
      val st = m.stats("text#ng")
      st.min.startsWith("@") && st.min.length < 200
    }, "ngram filters must be sidecar pointers in the log")

    def hashOf(v: String): Long =
      new org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(v),
          StringType)), 42L)
        .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
        .asInstanceOf[Long]
    def expectFiles(needle: String): Int = {
      val grams = needle.sliding(Bloom.NgramN).toSeq.distinct
      metas.values.count { m =>
        val st = m.stats("text#ng")
        grams.forall(g => Bloom.mayContain(st.min, st.max, hashOf(g)))
      }
    }
    def scanned(d: org.apache.spark.sql.DataFrame): Long = {
      d.collect()
      d.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numFiles").value
    }

    val df = TxFileIndex.readV2(spark, path)
    val hit = df.filter(col("text").contains("gammaword"))
    assert(expectFiles("gammaword") < metas.size,
      "disjoint vocabularies must make the ngram index skip files")
    assert(scanned(hit) == expectFiles("gammaword"))
    assert(hit.count() == 2, "no false negatives")

    // LIKE spellings reach the same probe (optimizer → Contains /
    // StartsWith / EndsWith)
    assert(scanned(df.filter(col("text").like("%epsilonword%")))
      == expectFiles("epsilonword"))
    assert(scanned(df.filter(col("text").startsWith("the alphaword")))
      == expectFiles("the alphaword"))
    assert(scanned(df.filter(col("text").endsWith("gammaword text")))
      == expectFiles("gammaword text"))

    // a needle nowhere in the corpus skips everything (w.h.p.)
    val none = df.filter(col("text").contains("zzqqxxyy"))
    assert(scanned(none) == expectFiles("zzqqxxyy") && none.count() == 0)

    // shorter than one gram: cannot probe, scans every file
    val short = df.filter(col("text").contains("gam"))
    assert(scanned(short) == metas.size)
    assert(short.count() == 2)
  }

  test("tables without the property build no ngram filters and " +
      "substring predicates scan everything (the opt-in contract)") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_txngram_off").toString + "/t"
    TxTable.append(spark,
      Seq((java.sql.Date.valueOf("2024-03-01"), 1L, "alphaword here"))
        .toDF("date", "doc_id", "text"), path)
    assert(TxTable.liveStats(spark, path).values
      .forall(!_.stats.contains("text#ng")))
  }
}
