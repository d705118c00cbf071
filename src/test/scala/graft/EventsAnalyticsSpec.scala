package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic checks for the behavioral-analytics family
  * (EventsQueries: funnel / retention / gap-fill / sequence match /
  * argMin-argMax) beyond the DuckDB hash gates — goldens on crafted
  * inputs where the interesting edge cases (window expiry, out-of-order
  * stages, gaps, LOCF carry) are pinned by hand.
  */
class EventsAnalyticsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_funnel: stages are monotone and cover all users") {
    val rows = q("q_funnel").collect()
    val total = rows.map(_.getAs[Long]("n_users")).sum
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(total == users, s"funnel rows must partition users")
    val stages = rows.map(_.getAs[Int]("stage"))
    assert(stages.sameElements(stages.sorted))
    // sf corpus is dense: most users complete the funnel
    assert(stages.contains(4))
  }

  test("funnel stage machine: window expiry and order are enforced") {
    // crafted per-user event streams, times in hours from epoch:
    //  u1: clean signup(0) -> view(1) -> click(2) -> purchase(3)  = 4
    //  u2: view BEFORE signup only                                 = 1
    //  u3: signup(0), view at day 8 (outside 7-day window)         = 1
    //  u4: signup(0) -> view(1) -> purchase(2) (click missing)     = 2
    //  u5: no signup at all                                        = 0
    val h = 3600L * 1000000L
    val evs = Seq(
      (1L, 0 * h, "signup"), (1L, 1 * h, "view"), (1L, 2 * h, "click"),
      (1L, 3 * h, "purchase"),
      (2L, 0 * h, "view"), (2L, 1 * h, "signup"),
      (3L, 0 * h, "signup"), (3L, 8 * 24 * h, "view"),
      (4L, 0 * h, "signup"), (4L, 1 * h, "view"), (4L, 2 * h, "purchase"),
      (5L, 0 * h, "view"), (5L, 1 * h, "purchase"))
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"))
    val folded = graft.queries.EventsQueries
      .funnelStages(evs)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(folded == Map(1L -> 4, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 0))
  }

  test("q_interarrival: gap stats are internally consistent and the " +
      "steadiness decision discriminates") {
    val rows = q("q_interarrival").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, av, mx) = (r.getAs[Long]("min_gap_s"),
        r.getAs[Long]("avg_gap_s"), r.getAs[Long]("max_gap_s"))
      assert(mn <= av && av <= mx, s"gap stats out of order: $r")
      assert(r.getAs[Long]("n_gaps") >= 4)
      assert(r.getAs[Long]("spread_pct") == 100L * (mx - mn) / av)
      assert(r.getAs[Boolean]("steady") == (r.getAs[Long]("spread_pct") <= 250))
    }
    val steady = rows.count(_.getAs[Boolean]("steady"))
    assert(steady > 0 && steady < rows.length,
      s"threshold must split, steady=$steady/${rows.length}")
  }

  test("q_retention: day 0 is the full signup cohort; offsets bounded") {
    val rows = q("q_retention").collect()
    val d0 = rows.find(_.getAs[Int]("day_offset") == 0).get
      .getAs[Long]("n_users")
    val cohort = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    // every cohort user is active on their own signup day by definition
    assert(d0 == cohort)
    assert(rows.forall { r =>
      val o = r.getAs[Int]("day_offset"); o >= 0 && o <= 7
    })
    assert(rows.forall(_.getAs[Long]("n_users") <= cohort))
  }

  test("q_gapfill: dense grid, zero-filled gaps, LOCF carries values") {
    val rows = q("q_gapfill").collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    val hours = rows.map(_.getAs[java.sql.Timestamp]("hr")).distinct
    // dense cross product: |grid| = |hours| x |types|
    assert(rows.length == types.length * hours.length)
    // real gaps exist in the corpus and are zero-filled
    val gaps = rows.filter(_.getAs[Long]("n") == 0L)
    assert(gaps.nonEmpty, "expected empty hour cells at this SF")
    // LOCF: a gap row carries the previous non-gap row's cents
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { series =>
      val sorted = series.sortBy(_.getAs[java.sql.Timestamp]("hr").getTime)
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur.getAs[Long]("n") == 0L =>
          assert(cur.getAs[Long]("cents_locf") ==
            prev.getAs[Long]("cents_locf"))
        case _ => ()
      }
    }
    // grid totals reconcile with the raw fact count
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.events(spark, sf).count())
  }

  test("q_seq_match: patterns are genuinely discriminating") {
    val rows = q("q_seq_match").collect()
    val vpe = rows.count(_.getAs[Boolean]("m_vpe"))
    assert(vpe > 0 && vpe < rows.length,
      s"contiguous vpe must split the population, got $vpe/${rows.length}")
    // count agrees with the boolean
    rows.foreach { r =>
      assert((r.getAs[Int]("n_vpe") > 0) == r.getAs[Boolean]("m_vpe"))
    }
  }

  test("q_argmax: first/last agree with a window-function cross-check") {
    val e = Tables.events(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val firstLast = e
      .withColumn("c", round(col("value") * 100, 0).cast("long"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rnd", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1 || col("rnd") === 1)
      .groupBy("event_type")
      .agg(max(when(col("rn") === 1, col("c"))).as("first_c"),
        max(when(col("rnd") === 1, col("c"))).as("last_c"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("first_c"), r.getAs[Long]("last_c"))).toMap
    q("q_argmax").collect().foreach { r =>
      val (f, l) = firstLast(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("first_cents") == f)
      assert(r.getAs[Long]("last_cents") == l)
    }
  }
}
