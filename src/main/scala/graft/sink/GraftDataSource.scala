package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SQLContext}
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister, RelationProvider, StreamSinkProvider,
  StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** [[TxTable]] as a REGISTERED Spark data source (`format("graft")`) —
  * the integration seam that makes the commit-log table a first-class
  * citizen of the normal Spark API instead of a library call:
  *
  * {{{
  *   df.write.format("graft").mode("append").save("/lake/flows")
  *   spark.read.format("graft").load("/lake/flows")
  *   spark.read.format("graft").option("versionAsOf", 3).load(...)
  *   spark.sql("""CREATE TEMPORARY VIEW flows
  *                USING graft OPTIONS (path '/lake/flows')""")
  * }}}
  *
  * Reads hand the planner the SAME log-driven relation as
  * [[TxFileIndex.readV2]] (partition pruning, min/max + Bloom/token
  * skipping, era schemas), so nothing is lost by going through the
  * generic API; `versionAsOf` exposes time travel in the option
  * Delta users know. Writes map SaveMode onto the transactional ops:
  * Append → [[TxTable.append]], Overwrite → [[TxTable.overwrite]],
  * ErrorIfExists/Ignore with their standard meanings against the
  * commit log's existence.
  */
class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft data source requires a path"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val table = path(parameters)
    require(!(parameters.contains("versionAsOf") &&
      parameters.contains("timestampAsOf")),
      "set versionAsOf OR timestampAsOf, not both")
    val asOf = parameters.get("versionAsOf").map(_.toLong).orElse(
      parameters.get("timestampAsOf").map { s =>
        // accept an instant or the SQL timestamp spelling, UTC
        val inst =
          try java.time.Instant.parse(s)
          catch { case _: java.time.format.DateTimeParseException =>
            java.time.LocalDateTime.parse(s.replace(' ', 'T'))
              .toInstant(java.time.ZoneOffset.UTC) }
        TxTable.versionAt(spark, table, inst)
      })
    TxFileIndex.relation(spark, table, asOf)
  }

  // ---- streaming read: tail the commit log (see GraftStreamSource) --

  private def cdf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      GraftStreamSource.schemaFor(sqlContext.sparkSession,
        path(parameters), cdf(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftStreamSource(sqlContext.sparkSession, path(parameters),
      parameters.get("maxVersionsPerTrigger").map(_.toLong),
      parameters.get("skipChangeCommits").exists(_.toBoolean),
      parameters.get("maxFilesPerTrigger").map(_.toLong),
      cdf(parameters))

  // ---- streaming write: exactly-once micro-batch commits -----------

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode != OutputMode.Update(),
      "graft streaming sink supports append (appendTxn) and complete " +
        "(overwriteTxn per batch); keyed upserts go through " +
        "foreachBatch + TxTable.merge")
    new GraftStreamSink(sqlContext.sparkSession, path(parameters),
      GraftStreamSink.writerIdFor(parameters), outputMode)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val table = path(parameters)
    require(data.columns.contains("date"),
      "graft tables are date-partitioned: the written frame needs a " +
        "`date` column")
    val exists = TxTable.currentVersion(spark, table) >= 0
    mode match {
      case SaveMode.Append => TxTable.append(spark, data, table)
      case SaveMode.Overwrite => TxTable.overwrite(spark, data, table)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft table $table already exists (SaveMode.ErrorIfExists)")
        else TxTable.append(spark, data, table)
      case SaveMode.Ignore =>
        if (!exists) TxTable.append(spark, data, table)
    }
    createRelation(sqlContext, parameters)
  }
}
