package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational query surface: the ClickHouse-style filter / group-by /
  * sum / order-by operations the reference exposes over its flow table
  * (SURVEY.md §2.5 A1-A7, §2.7 O1-O3, §2.3 P3/P5/P8/P10), exercised over
  * the driver's TPC-H-ish tables so each is DuckDB-oracle-checkable.
  *
  * Determinism rules (oracle hash-parity):
  *  - money sums are computed as exact integer cents
  *    (`sum(cast(round(x*100) as long))`) so result bits don't depend on
  *    float summation order — Spark and DuckDB sum in different orders;
  *  - every query ends in a total ORDER BY over non-null keys;
  *  - counts / row_numbers are cast so both engines agree on the type.
  *
  * Scale notes (100 TB): all queries below are single shuffle-stage
  * hash-aggregations or broadcast-able joins; Catalyst emits partial
  * (map-side) aggregation before the exchange, so the shuffle carries
  * only group keys × partial sums, not raw rows. The big fact tables
  * (lineitem/orders/events) are only ever scanned with column pruning
  * and pushed filters.
  */
object CoreQueries {

  /** exact integer cents for a 2-decimal double — float-order-immune sum. */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100, 0).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A3: the SummingMergeTree-style groupBy-sum (ref README.md:180-184)
    "q1_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").cast("long").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // J1-style enrichment join + aggregation: revenue per nation.
    // nation/region are tiny dims -> broadcast hash join, no shuffle of facts.
    "q2_join_agg" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_price_cents"))
        .orderBy("n_name")
    }),

    // O1: ORDER BY sum DESC + LIMIT k (TakeOrderedAndProject — no full sort)
    "q3_topk" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.groupBy("o_custkey")
        .agg(sum(cents(col("o_totalprice"))).as("revenue_cents"))
        .orderBy(desc("revenue_cents"), asc("o_custkey"))
        .limit(10)
    }),

    // A6-style dedup-by-ranking: top-3 orders per customer via row_number
    "q4_window_rank" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      o.select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy("o_custkey", "rnk")
    }),

    // W1/P8/A2: minute-grain tumbling aggregation over the event stream
    "q5_minute_agg" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.groupBy(date_trunc("minute", col("ts")).as("minute_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(cents(col("value"))).as("value_cents"))
        .orderBy("minute_start", "event_type")
    }),

    // F6/J2: anti-join (customers with no high-value order)
    "q6_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // semi-join (customers with at least one open order)
    "q7_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // A7: distinct scan
    "q8_distinct" -> ((s, d) => {
      Tables.documents(s, d)
        .select("lang", "source").distinct()
        .orderBy("lang", "source")
    }),

    // O3: directional fan-out — one row becomes direction='out'/'in' rows
    // via an explode(array(struct..)) Generator (ref worker.go:143-222)
    "q9_fanout" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.select(col("l_orderkey"), col("l_linenumber"),
          explode(array(
            struct(lit("out").as("direction"),
              col("l_quantity").cast("long").as("qty")),
            struct(lit("in").as("direction"),
              (col("l_quantity") * 2).cast("long").as("qty")))).as("dd"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("dd.direction").as("direction"), col("dd.qty").as("qty"))
        .orderBy("l_orderkey", "l_linenumber", "direction")
    }),

    // P3: enum mapping via CASE WHEN (proto number -> name analog)
    "q10_case_when" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.select(
          when(col("event_type").isin("click", "view"), "read")
            .when(col("event_type").isin("purchase", "signup"), "write")
            .otherwise("other").as("kind"))
        .groupBy("kind").agg(count(lit(1)).as("n"))
        .orderBy("kind")
    }),

    // P5-analog: map/JSON extraction with typed cast + aggregation
    "q11_json_extract" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("user_id")
        .agg(sum(col("k")).cast("long").as("k_sum"),
          max(col("k")).as("k_max"))
        .orderBy("user_id")
    }),

    // P10: string normalization (lowercase + strip spaces)
    "q12_string_norm" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          lower(regexp_replace(col("p_name"), " ", "")).as("norm_name"),
          lower(col("p_type")).as("norm_type"))
        .orderBy("p_partkey")
    }),

    // P8: date truncation + calendar parts
    "q13_date_parts" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("yr", "mo")
    }),

    // fact-fact shuffle join: lineitem x orders are both "big" sides, so
    // this is forced onto the sort-merge path (the plan shape fact-fact
    // joins take at 100 TB, where neither side broadcasts); AQE picks
    // partition counts at runtime
    "q14_bigjoin" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      li.hint("merge")
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          sum("l_quantity").cast("long").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("price_cents"))
        .orderBy("o_orderpriority")
    }),

    // sliding event-time window (2 min wide, 1 min slide) — beyond the
    // reference's tumbling-only surface; each event lands in 2 windows
    "q16_sliding_window" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.groupBy(window(col("ts"), "2 minutes", "1 minute").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type")
    }),

    // event-time sessionization via Spark's NATIVE session_window
    // (gap-merged variable-length windows — the operator behind
    // "sessions" in any product analytics surface, and the batch twin
    // of the stateful streaming gate qs_sessionize). 24h gap yields
    // real multi-event sessions on the testdata's ~12h median
    // inter-event spacing. Scale shape: one exchange on user_id,
    // session merging runs inside the aggregation.
    "q18_sessionize" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.groupBy(col("user_id"),
          session_window(col("ts"), "86400 seconds").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("value_cents"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"),
          col("value_cents"))
        .orderBy("user_id", "session_start")
    }),

    // set ops: segments buying in both halves of the order history
    // exact grouped quantiles by RANK SELECTION (discrete lower-middle
    // median, ceil-rank p90) — integer-only, so both engines agree
    // bit-for-bit where interpolated percentile() would diverge in the
    // last float ulp. Scale note: exact quantiles need a per-group sort
    // (the window); at 100 TB one switches to a mergeable sketch
    // (GK/KLL/t-digest) and accepts approximation — that variant is
    // deliberately not oracle-gated because no two engines' sketches
    // agree bit-for-bit.
    "q19_quantiles" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"), cents(col("value")).as("cents"))
      val w = Window.partitionBy("event_type").orderBy("cents")
      val counts = e.groupBy("event_type").agg(count(lit(1)).as("n"))
      e.withColumn("rn", row_number().over(w))
        .join(broadcast(counts), "event_type")
        .groupBy("event_type")
        .agg(max("n").as("n"),
          max(when(col("rn") === expr("(n + 1) div 2"), col("cents")))
            .as("median_cents"),
          max(when(col("rn") === expr("(9 * n + 9) div 10"), col("cents")))
            .as("p90_cents"))
        .orderBy("event_type")
    }),

    // the 100 TB quantile/distinct story q19's comment promises: a
    // MERGEABLE KLL sketch (graft.functions.KllQuantiles) plus HLL
    // distinct (approx_count_distinct), each VALIDATED against the
    // exact answer inside the query itself. Sketches can't be
    // hash-compared across engines (no two implementations agree
    // bit-for-bit), so the gate checks the part that is portable: the
    // error bound. Output is one boolean per guarantee — the oracle
    // states all of them hold. Scale shape: the sketch rides the normal
    // partial-agg path (one small ladder per group × partition crosses
    // the exchange, never the data); the validation joins are
    // broadcast-sized (|event_type| rows).
    "q19_sketch_check" -> ((s, d) => {
      val e = Tables.events(s, d)
        .select(col("event_type"), col("user_id"), cents(col("value")).as("cents"))
      val kll = udaf(new graft.functions.KllQuantiles(Seq(0.5, 0.9)),
        org.apache.spark.sql.Encoders.scalaLong)
      // HLL rsd 1%: the gate below allows 5% — rsd is a STANDARD
      // DEVIATION, not a bound, so gating a 5%-rsd sketch at 5% is a
      // 1-sigma coin flip (and indeed broke at sf0.1). At 1% rsd the
      // 5% gate sits at 5 sigma and holds at every scale factor.
      val est = e.groupBy("event_type")
        .agg(kll(col("cents")).as("qs"),
          approx_count_distinct(col("user_id"), 0.01).as("du_est"))
        .select(col("event_type"), col("qs")(0).as("med_est"),
          col("qs")(1).as("p90_est"), col("du_est"))
      // tie-aware rank check: a repeated value occupies the whole rank
      // interval [count(<v)+1, count(<=v)]; the estimate is in-bound
      // when the target rank is within tolerance OF THE INTERVAL
      def rankOk(lo: org.apache.spark.sql.Column,
          hi: org.apache.spark.sql.Column,
          target: org.apache.spark.sql.Column) =
        greatest(lo + 1 - target, target - hi, lit(0L)) <= col("n") * 0.02
      e.join(broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
          sum(when(col("cents") < col("med_est"), 1L).otherwise(0L)).as("med_lo"),
          sum(when(col("cents") <= col("med_est"), 1L).otherwise(0L)).as("med_hi"),
          sum(when(col("cents") < col("p90_est"), 1L).otherwise(0L)).as("p90_lo"),
          sum(when(col("cents") <= col("p90_est"), 1L).otherwise(0L)).as("p90_hi"),
          countDistinct(col("user_id")).as("du_exact"),
          max(col("du_est")).as("du_est"),
          count(lit(1)).as("n"))
        // KLL rank tolerance 2% of n; HLL++ default rsd is 5%
        .select(col("event_type"),
          rankOk(col("med_lo"), col("med_hi"), (col("n") + 1) / 2)
            .as("median_ok"),
          rankOk(col("p90_lo"), col("p90_hi"),
            expr("CAST(ceil(0.9 * n) AS BIGINT)")).as("p90_ok"),
          (abs(col("du_est") - col("du_exact"))
            <= col("du_exact") * 0.05 + 1).as("distinct_ok"))
        .orderBy("event_type")
    }),

    "q17_set_ops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val oc = o.join(c, o("o_custkey") === c("c_custkey"))
      val early = oc.filter(year(col("o_orderdate")) <= 1997)
        .select("c_mktsegment")
      val late = oc.filter(year(col("o_orderdate")) >= 1998)
        .select("c_mktsegment")
      early.intersect(late).withColumn("set_op", lit("both"))
        .unionByName(early.except(late).withColumn("set_op", lit("early_only")))
        .unionByName(late.except(early).withColumn("set_op", lit("late_only")))
        .withColumnRenamed("c_mktsegment", "segment")
        .orderBy("set_op", "segment")
    }),

    // AS-OF JOIN, the single-shuffle way: for each purchase, the most
    // recent view by the same user at-or-before the purchase. Instead of
    // a range join (quadratic per hot user), both event kinds go through
    // ONE window over (user, time): views sort before same-timestamp
    // purchases, and `last(..., ignoreNulls)` over the preceding frame
    // carries the latest view forward. One exchange on user_id, no join
    // — the plan an as-of lookup should have at 100 TB
    "q20_asof" -> ((s, d) => {
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "view", 0).otherwise(1).as("kind"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      e.withColumn("asof_view_ts",
          last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
        .withColumn("asof_view_id",
          last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        // no-prior-view -> explicit sentinels, not nulls
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("asof_view_ts"),
            to_timestamp(lit("1970-01-01 00:00:00"))).as("asof_view_ts"),
          coalesce(col("asof_view_id"), lit(-1L)).as("asof_view_id"))
        .orderBy("event_id")
    }),

    // ROLLUP hierarchy totals with grouping_id — the subtotal/grand-
    // total surface of a reporting layer; one pass, Catalyst expands to
    // a single Expand + hash aggregate (no per-level re-scan)
    "q21_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("int").as("gid"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("gid"), col("sum_qty"), col("n"))
        .orderBy("gid", "rf", "ls")
    }),

    // PIVOT (long -> wide): order counts by priority column per status;
    // Catalyst rewrites pivot into a single aggregate with conditional
    // counters — exactly the SUM(CASE...) the oracle spells out
    "q22_pivot" -> ((s, d) => {
      val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val p = Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", pris)
        .agg(count(lit(1)))
      p.select(col("o_orderstatus") +: pris.zipWithIndex.map { case (pr, i) =>
          coalesce(p(s"`$pr`"), lit(0L)).as(s"p${i + 1}") }: _*)
        .orderBy("o_orderstatus")
    }),

    // self-join against a per-key aggregate: orders matching their
    // customer's maximum price (exact double equality of the same stored
    // value — deterministic on both engines)
    "q15_self_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val mx = o.groupBy(col("o_custkey").as("ck"))
        .agg(max("o_totalprice").as("max_price"))
      o.join(mx, o("o_custkey") === mx("ck") &&
          o("o_totalprice") === mx("max_price"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_at_max"),
          sum(cents(col("o_totalprice"))).as("max_price_cents"))
        .orderBy("o_custkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join_agg" ->
      """SELECT n_name,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS total_price_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q3_topk" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders GROUP BY o_custkey
        |ORDER BY revenue_cents DESC, o_custkey LIMIT 10""".stripMargin,
    "q4_window_rank" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q5_minute_agg" ->
      """SELECT date_trunc('minute', ts) AS minute_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(ROUND(value*100,0) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q19_quantiles" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ROUND(value*100,0) AS BIGINT) AS cents
        |  FROM events
        |), r AS (
        |  SELECT event_type, cents,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM e)
        |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS BIGINT)
        |    AS median_cents,
        |  CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END) AS BIGINT)
        |    AS p90_cents
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the sketch gate is the guarantee, not the estimate: the Spark side
    // computes whether KLL/HLL landed inside their error bounds against
    // the exact answers; the oracle states the bounds must hold
    "q19_sketch_check" ->
      """SELECT event_type, TRUE AS median_ok, TRUE AS p90_ok,
        |  TRUE AS distinct_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // session_window merge rule: consecutive events merge iff
    // diff <= gap (the window end is INCLUSIVE on merge — pinned by
    // WatermarkSpec's boundary test), so the break condition is
    // > gap; DuckDB reads the parquet ts at nanos, Spark at micros —
    // CAST(ts AS TIMESTAMP) truncates to the same micros
    "q18_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS mts,
        |    CAST(ROUND(value*100,0) AS BIGINT) AS cents
        |  FROM events
        |), b AS (
        |  SELECT *, CASE WHEN LAG(mts) OVER w IS NULL
        |      OR epoch_us(mts) - epoch_us(LAG(mts) OVER w) > 86400000000
        |    THEN 1 ELSE 0 END AS brk
        |  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY mts, event_id)
        |), s2 AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id
        |    ORDER BY mts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b)
        |SELECT user_id, MIN(mts) AS session_start,
        |  MAX(mts) + INTERVAL 86400 SECOND AS session_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(cents) AS BIGINT) AS value_cents
        |FROM s2 GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q7_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q8_distinct" ->
      "SELECT DISTINCT lang, source FROM documents ORDER BY lang, source",
    "q9_fanout" ->
      """SELECT l_orderkey, l_linenumber, direction, qty FROM (
        |  SELECT l_orderkey, l_linenumber, 'out' AS direction,
        |    CAST(l_quantity AS BIGINT) AS qty FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'in' AS direction,
        |    CAST(l_quantity*2 AS BIGINT) AS qty FROM lineitem) t
        |ORDER BY l_orderkey, l_linenumber, direction""".stripMargin,
    "q10_case_when" ->
      """SELECT kind, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT CASE WHEN event_type IN ('click','view') THEN 'read'
        |    WHEN event_type IN ('purchase','signup') THEN 'write'
        |    ELSE 'other' END AS kind FROM events) t
        |GROUP BY kind ORDER BY kind""".stripMargin,
    "q11_json_extract" ->
      """SELECT user_id,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS k_max
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q12_string_norm" ->
      """SELECT p_partkey, LOWER(REPLACE(p_name, ' ', '')) AS norm_name,
        |  LOWER(p_type) AS norm_type
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q13_date_parts" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q16_sliding_window" ->
      """SELECT w_start, event_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT date_trunc('minute', ts) AS w_start, event_type FROM events
        |  UNION ALL
        |  SELECT date_trunc('minute', ts) - INTERVAL 1 MINUTE, event_type
        |  FROM events) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q17_set_ops" ->
      """WITH oc AS (
        |  SELECT c_mktsegment, EXTRACT(year FROM o_orderdate) AS yr
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |), early AS (SELECT DISTINCT c_mktsegment FROM oc WHERE yr <= 1997),
        |late AS (SELECT DISTINCT c_mktsegment FROM oc WHERE yr >= 1998)
        |SELECT c_mktsegment AS segment, set_op FROM (
        |  SELECT c_mktsegment, 'both' AS set_op
        |  FROM (SELECT * FROM early INTERSECT SELECT * FROM late) a
        |  UNION ALL
        |  SELECT c_mktsegment, 'early_only'
        |  FROM (SELECT * FROM early EXCEPT SELECT * FROM late) b
        |  UNION ALL
        |  SELECT c_mktsegment, 'late_only'
        |  FROM (SELECT * FROM late EXCEPT SELECT * FROM early) c) t
        |ORDER BY set_op, segment""".stripMargin,
    "q14_bigjoin" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // same deterministic total order as the Spark window: (ts, kind,
    // event_id) — a view at the exact purchase timestamp counts as prior
    "q20_asof" ->
      """WITH t AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS mts,
        |    CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS kind
        |  FROM events WHERE event_type IN ('view', 'purchase')
        |), w AS (
        |  SELECT *,
        |    LAST_VALUE(CASE WHEN kind = 0 THEN mts END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY mts, kind, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS av_ts,
        |    LAST_VALUE(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY mts, kind, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS av_id
        |  FROM t)
        |SELECT event_id, user_id, mts AS ts,
        |  COALESCE(av_ts, TIMESTAMP '1970-01-01') AS asof_view_ts,
        |  CAST(COALESCE(av_id, -1) AS BIGINT) AS asof_view_id
        |FROM w WHERE kind = 1 ORDER BY event_id""".stripMargin,
    "q21_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin,
    "q22_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q15_self_join" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_at_max,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS max_price_cents
        |FROM orders o JOIN (
        |  SELECT o_custkey AS ck, MAX(o_totalprice) AS max_price
        |  FROM orders GROUP BY 1) m
        |ON o.o_custkey = m.ck AND o.o_totalprice = m.max_price
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
  )
}
