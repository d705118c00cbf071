package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's oracle-checked query
  * surface; `oracleSql` holds the DuckDB-equivalent SQL the driver runs
  * over the same parquet tables. Column names/types are aligned on both
  * sides (the driver hash-compares after sorting columns by name).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.FlowQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.EventsQueries.queries ++
      graft.queries.MiscQueries.queries ++
      graft.queries.CatalogQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
      graft.queries.FlowQueries.oracle ++
      graft.queries.TextQueries.oracle ++
      graft.queries.VectorQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++
      graft.queries.EventsQueries.oracle ++
      graft.queries.MiscQueries.oracle ++
      graft.queries.CatalogQueries.oracle
}
