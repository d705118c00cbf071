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
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view for the SQL surface. `events`
    * must go through [[events]] (nanos-timestamp conversion) — a raw
    * load either throws ILLEGAL_PARQUET_TYPE or exposes `ts` as a bare
    * nanos LONG depending on session state.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
