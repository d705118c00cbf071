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
}
