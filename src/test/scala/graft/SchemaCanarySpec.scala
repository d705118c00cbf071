package graft

import org.scalatest.funsuite.AnyFunSuite

/** Corpus-drift canary for every driver-owned table: each loader must
  * surface exactly the canonical logical schema the repo's 98 queries
  * (and their DuckDB oracles) were written against, whatever physical
  * encoding the regenerated parquet uses. A failure here names the
  * table and column precisely, instead of a DATATYPE_MISMATCH thirty
  * queries into a verify run (the round-5 events.ts incident, see
  * FIXTURES.md §6). Complements [[TsCanarySpec]], which checks ts
  * VALUES, not just types.
  */
class SchemaCanarySpec extends AnyFunSuite {
  import TestSpark._

  private val loaders: Map[String,
      (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "region" -> Tables.region, "nation" -> Tables.nation,
      "customer" -> Tables.customer, "supplier" -> Tables.supplier,
      "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "events" -> Tables.events,
      "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)

  test("every loader surfaces its canonical logical schema") {
    Tables.names.foreach { t =>
      val got = loaders(t)(spark, sf).schema
        .map(f => f.name -> f.dataType)
      val want = Tables.canonicalSchemas(t)
      assert(got == want,
        s"table $t drifted:\n  loaded   $got\n  canonical $want\n" +
          "(regenerated testdata changed shape — extend the loader's " +
          "normalization, see FIXTURES.md §6)")
    }
  }

  test("every table has rows at the spec scale factor") {
    Tables.names.foreach { t =>
      assert(loaders(t)(spark, sf).limit(1).count() == 1L,
        s"table $t is empty at $sf")
    }
  }
}
