package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Time-sanity canary: the round-5 regression (driver regenerated
  * events.parquet with TIMESTAMP(MICROS) while the loaders hard-coded a
  * nanos-as-long DIV 1000 workaround) shifted every event timestamp
  * ~1000× into the past and corrupted 7 streaming gates SILENTLY. These
  * asserts make any future physical-type drift a loud test failure in
  * BOTH loaders (batch `Tables.events` and streaming
  * `StreamingFlows.eventsStream`): whatever unit the corpus stores,
  * min(ts) must land in a plausible calendar year.
  */
class TsCanarySpec extends AnyFunSuite {
  import TestSpark._

  private def assertSaneYears(minTs: java.sql.Timestamp,
      maxTs: java.sql.Timestamp, who: String): Unit = {
    val lo = java.sql.Timestamp.valueOf("1990-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2100-01-01 00:00:00")
    assert(minTs.after(lo) && minTs.before(hi),
      s"$who: min(ts)=$minTs outside [1990, 2100] — loader misread the " +
        "parquet timestamp unit (nanos/micros drift)")
    assert(maxTs.after(lo) && maxTs.before(hi),
      s"$who: max(ts)=$maxTs outside [1990, 2100]")
    assert(!maxTs.before(minTs), s"$who: max(ts) < min(ts)")
  }

  test("batch loader: events.ts is a sane micro-precision timestamp") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType,
      s"canonical ts type is TimestampType, got ${df.schema("ts").dataType}")
    val r = df.agg(min("ts").as("lo"), max("ts").as("hi")).head()
    assertSaneYears(r.getAs[java.sql.Timestamp]("lo"),
      r.getAs[java.sql.Timestamp]("hi"), "Tables.events")
  }

  test("streaming loader: landing-dir ts is normalized at staging time") {
    val stream = graft.streaming.StreamingFlows.eventsStream(spark, sf)
    assert(stream.schema("ts").dataType == TimestampType)
    val r = graft.streaming.StreamingFlows.runToMemory(spark,
      stream.agg(min("ts").as("lo"), max("ts").as("hi"))).head()
    assertSaneYears(r.getAs[java.sql.Timestamp]("lo"),
      r.getAs[java.sql.Timestamp]("hi"), "StreamingFlows.eventsStream")
  }

  test("normalizeEventTs adapts to every physical encoding") {
    import spark.implicits._
    val us = 1717200000000000L // 2024-06-01 00:00:00 UTC in micros
    // legacy corpus shape: raw nanos long
    val legacy = Seq(us * 1000L).toDF("ts")
    assert(legacy.schema("ts").dataType == LongType)
    val fromNanos = Tables.normalizeEventTs(legacy)
    assert(fromNanos.schema("ts").dataType == TimestampType)
    // current corpus shape: micros NTZ
    val ntz = Seq(us).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val fromNtz = Tables.normalizeEventTs(ntz)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    // already canonical: pass-through
    val canon = Seq(us).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(Tables.normalizeEventTs(canon).schema("ts").dataType ==
      TimestampType)
    // all three decode to the same instant (UTC session)
    val expect = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(us / 1000000L))
    for ((df, who) <- Seq((fromNanos, "nanos"), (fromNtz, "ntz"),
        (canon, "canonical")))
      assert(df.head().getAs[java.sql.Timestamp]("ts") == expect,
        s"$who decode mismatch")
  }
}
