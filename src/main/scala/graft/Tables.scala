package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * At 100 TB these would be partitioned table roots; `spark.read.parquet`
  * on a directory tree picks up partition columns automatically, so every
  * query below works unchanged when `dir` points at a partitioned lake.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The driver regenerates the parquet corpus between rounds and the
    * PHYSICAL type of `events.ts` has already changed once
    * (TIMESTAMP(NANOS) → TIMESTAMP(MICROS, ntz)). Loaders must probe the
    * footer schema and adapt, never assume — the reference treats every
    * external feed the same way (k8s state is re-listed, watcher.go:52-120;
    * range feeds are parsed defensively, public_ranges.go:311-361).
    * Canonical in-engine type: micro-precision TimestampType, UTC session.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      // legacy corpus: TIMESTAMP(NANOS) surfaced as a raw nanos long via
      // spark.sql.legacy.parquet.nanosAsLong; integer division keeps
      // precision above 2^53 ns
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      // current corpus: TIMESTAMP(MICROS, isAdjustedToUTC=false) → NTZ;
      // the UTC session timezone makes this cast value-preserving and
      // byte-identical to what DuckDB reads
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame = {
    // harmless when ts is already a timestamp; required for nanos corpora
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }
  /** Cast any column whose loaded dtype drifted from the canonical one
    * (same probe-don't-assume contract as [[normalizeEventTs]]; a cast
    * to the already-correct type is simplified away by Catalyst, so the
    * steady-state plan is unchanged).
    */
  private def normalize(df: DataFrame,
      want: (String, org.apache.spark.sql.types.DataType)*): DataFrame =
    df.select(df.columns.map { c =>
      want.collectFirst {
        case (n, t) if n == c && df.schema(c).dataType != t =>
          col(c).cast(t).as(c)
      }.getOrElse(col(c))
    }: _*)

  def documents(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    normalize(load(s, d, "documents"),
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
  }
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    normalize(load(s, d, "embeddings"),
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  }

  /** Register every table as a temp view for the SQL surface, routing
    * through the schema-normalizing loaders (`events` adapts the
    * timestamp encoding; `documents`/`embeddings` pin canonical types).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = n match {
        case "events"     => events(spark, dir)
        case "documents"  => documents(spark, dir)
        case "embeddings" => embeddings(spark, dir)
        case _            => load(spark, dir, n)
      }
      df.createOrReplaceTempView(n)
    }
}
