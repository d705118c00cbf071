package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Salting

class SaltingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // heavily skewed facts: 90% of rows share key 1
  private lazy val facts = (1L to 2000L)
    .map(i => (if (i % 10 == 0) i % 7 else 1L, i, i * 3))
    .toDF("k", "id", "v")
  private lazy val dim = (0L to 6L).map(k => (k, s"name-$k")).toDF("k", "kname")

  test("salted join is row-identical to the plain join under skew") {
    val plain = facts.join(dim, "k")
      .select("k", "id", "v", "kname")
    val salted = Salting.saltedJoin(facts, dim, "k", factor = 8)
      .select("k", "id", "v", "kname")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("two-phase salted aggregation preserves sums") {
    val plain = facts.groupBy("k").agg(sum("v").as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedSum(facts, Seq("k"), Seq("v"), factor = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted per-key cap (qp_domain_cap's dominant-domain arm) is " +
    "row-identical to the plain single-window cap — rank included") {
    import org.apache.spark.sql.expressions.Window
    // the qp_domain_cap shape on a skewed corpus: one domain holds 90%
    // of the docs, survivors picked by (md5, doc_id) order
    val docs = (1L to 3000L)
      .map(i => (i, if (i % 10 == 0) s"site-${i % 7}" else "megadomain"))
      .toDF("doc_id", "source")
      .withColumn("pick",
        md5(concat(lit("cap|"), col("doc_id").cast("string"))))
    val w = Window.partitionBy("source").orderBy(asc("pick"), asc("doc_id"))
    val plain = docs.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 15)
      .select("doc_id", "source", "rnk")
    val salted = Salting
      .saltedCap(docs, Seq("source"), Seq("pick", "doc_id"), k = 15,
        factor = 8)
      .select("doc_id", "source", "rnk")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
