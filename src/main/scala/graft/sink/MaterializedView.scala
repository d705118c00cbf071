package graft.sink

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{KllBuffer, KllMerge, KllState}

/** Incremental materialized-view maintenance over [[TxTable]] — the
  * ClickHouse materialized-view contract (an MV's SELECT runs over each
  * INSERTED block only, results append to an Aggregating/SummingMergeTree
  * target whose partial states merge at read time; reference DDL:
  * /root/reference/test/network_flows_0.sql:39-44 is itself a
  * SummingMergeTree the reference inserts pre-aggregated minutes into)
  * re-expressed on Spark + an object-store commit log:
  *
  *  - The BASE table's commit log is the change feed: [[refresh]] reads
  *    only the files appended since the last applied base version
  *    ([[TxTable.rangeDelta]]) — never the whole table. Rewrite commits
  *    (compaction / merge / retention) are skipped, exactly ClickHouse's
  *    "merges do not re-trigger MVs".
  *  - Each refresh appends one batch of PARTIAL per-group states to the
  *    MV table via [[TxTable.appendTxn]] keyed by the base version — so
  *    refresh is EXACTLY-ONCE and idempotent under replays, crashes, and
  *    concurrent refreshers (the loser of the race no-ops with -1).
  *  - Reads ([[read]]) fold the partials with each state's merge
  *    combinator — ClickHouse's `-Merge` to ingest's `-State`.
  *  - [[compact]] collapses accumulated partials state-preservingly (the
  *    AggregatingMergeTree background merge), and is safe against a
  *    concurrent refresh because states are ADDITIVE: a partial file
  *    appended between compact's read and its commit simply stays live
  *    next to the collapsed set.
  *
  * Scale shape: refresh I/O is O(delta), the MV table is O(groups), and
  * a consumer lagging less than the base's vacuum retention always finds
  * its delta files on disk (immutable files + retention window). The
  * aggregation algebra is restricted to mergeable states — sum, count,
  * min, max, avg as a (sum,cnt) pair, and KLL quantile sketches as
  * Tungsten-encoded ladder structs — which is precisely the restriction
  * ClickHouse's AggregateFunction columns impose.
  */
object MaterializedView {

  /** Writer id the MV's (appId, version) high-water mark is recorded
    * under in the MV table's log. One MV per target table, so a constant
    * id is unambiguous; the VERSION in the mark is the BASE table's
    * commit version the refresh covered up to.
    */
  val WriterApp = "graft-mv"

  /** One mergeable aggregation state: how to build the partial over a
    * delta batch, how to combine stored partials state-preservingly
    * (compaction), and how to finalize them at read time.
    */
  sealed trait StateAgg {
    def name: String
    def partial: Seq[Column]
    def combine: Seq[Column]
    def finish: Seq[Column]
    /** Whether the state supports RETRACTION — a delete applied as a
      * negative contribution (linear states only: sum/count/avg; a
      * retracted min/max would need the runner-up, which the state
      * doesn't carry). */
    def retractable: Boolean = false
    /** Signed partial over change-feed rows (`sign` = +1 insert /
      * −1 delete); only meaningful when [[retractable]]. */
    def partialSigned(sign: Column): Seq[Column] = partial
  }

  /** sumState/sumMerge: partial sums add. */
  final case class SumState(src: String, name: String) extends StateAgg {
    def partial = Seq(sum(col(src)).as(name))
    def combine = Seq(sum(col(name)).as(name))
    def finish = combine
    override def retractable = true
    override def partialSigned(sign: Column) =
      Seq(sum(col(src) * sign).as(name))
  }

  /** countState: a partial count is a sum at merge time. */
  final case class CountState(name: String) extends StateAgg {
    def partial = Seq(count(lit(1)).as(name))
    def combine = Seq(sum(col(name)).as(name))
    def finish = combine
    override def retractable = true
    override def partialSigned(sign: Column) =
      Seq(sum(sign).cast("long").as(name))
  }

  final case class MinState(src: String, name: String) extends StateAgg {
    def partial = Seq(min(col(src)).as(name))
    def combine = Seq(min(col(name)).as(name))
    def finish = combine
  }

  final case class MaxState(src: String, name: String) extends StateAgg {
    def partial = Seq(max(col(src)).as(name))
    def combine = Seq(max(col(name)).as(name))
    def finish = combine
  }

  /** avgState: the canonical non-trivially-mergeable aggregate — the
    * partial carries the (sum, count) pair in two columns; only
    * finalization divides. Averaging averages would be wrong the moment
    * two batches differ in size.
    */
  final case class AvgState(src: String, name: String) extends StateAgg {
    private val s = s"${name}_sum"
    private val c = s"${name}_cnt"
    def partial = Seq(sum(col(src)).as(s), count(col(src)).as(c))
    def combine = Seq(sum(col(s)).as(s), sum(col(c)).as(c))
    def finish =
      Seq((sum(col(s)).cast("double") / sum(col(c))).as(name))
    override def retractable = true
    override def partialSigned(sign: Column) = Seq(
      sum(col(src) * sign).as(s),
      sum(when(col(src).isNotNull, sign).otherwise(lit(0L)))
        .cast("long").as(c))
  }

  /** quantileState/quantileMerge over the [[graft.functions.KllQuantiles]]
    * ladder: the partial is the sketch buffer itself (a parquet-storable
    * struct), merged by ladder concatenation + re-compaction — so the MV
    * answers quantiles over all history while each refresh only ever saw
    * its own delta. Not SQL-expressible; gated by rank-error spec, not
    * the DuckDB oracle.
    */
  final case class QuantileState(src: String, name: String,
      probes: Seq[Double], k: Int = 200) extends StateAgg {
    def partial =
      Seq(udaf(new KllState(k), Encoders.scalaLong)
        .apply(col(src).cast("long")).as(name))
    // a case-class input encoder flattens to one udaf parameter per
    // field — feed the stored struct's fields positionally
    private def fields =
      Seq(col(s"$name.levels"), col(s"$name.n"), col(s"$name.comps"))
    def combine =
      Seq(udaf(new KllCombine(k), Encoders.product[KllBuffer])
        .apply(fields: _*).as(name))
    def finish =
      Seq(udaf(new KllMerge(probes, k), Encoders.product[KllBuffer])
        .apply(fields: _*).as(name))
  }

  /** State-to-state sketch combine for [[compact]]: fold stored buffers
    * into one buffer without finalizing.
    */
  private[sink] class KllCombine(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        KllBuffer, KllBuffer, KllBuffer] {
    private val inner = new KllState(k)
    def zero = inner.zero
    def reduce(acc: KllBuffer, st: KllBuffer) = inner.merge(acc, st)
    def merge(a: KllBuffer, b: KllBuffer) = inner.merge(a, b)
    def finish(b: KllBuffer) = b
    def bufferEncoder = Encoders.product[KllBuffer]
    def outputEncoder = Encoders.product[KllBuffer]
  }

  /** The view definition: group keys (must include `date` — the MV
    * target inherits the base's partition grain) + mergeable states.
    */
  final case class MvDef(groupKeys: Seq[String], states: Seq[StateAgg]) {
    require(groupKeys.contains("date"),
      "MV group keys must include the date partition column")
    private val taken = scala.collection.mutable.Set(groupKeys: _*)
    states.foreach(st => require(taken.add(st.name),
      s"duplicate MV column ${st.name}"))

    private def agg(df: DataFrame, cols: Seq[Column]): DataFrame =
      df.groupBy(groupKeys.map(col): _*).agg(cols.head, cols.tail: _*)

    /** Per-delta-batch partial aggregation (ingest `-State`). */
    def partial(delta: DataFrame): DataFrame =
      agg(delta, states.flatMap(_.partial))

    /** State-preserving collapse of stored partials (background merge). */
    def combine(partials: DataFrame): DataFrame =
      agg(partials, states.flatMap(_.combine))

    /** Read-time finalization (`-Merge`). */
    def finish(partials: DataFrame): DataFrame =
      agg(partials, states.flatMap(_.finish))

    /** Signed partial over CDF rows carrying `_change_type`: deletes
      * contribute NEGATIVELY, so appending this batch retracts them
      * from the view. */
    def partialRetract(changes: DataFrame): DataFrame = {
      val sign = when(col("_change_type") === "insert", lit(1L))
        .otherwise(lit(-1L))
      agg(changes, states.flatMap(_.partialSigned(sign)))
    }

    /** The explicit count state's column, when one exists — the
      * tombstone discriminator (a group whose combined count is 0 has
      * been fully retracted and must not be served). */
    val countStateName: Option[String] =
      states.collectFirst { case CountState(n) => n }

    /** Whether a destructive base commit can be applied by RETRACTION
      * instead of a full rebuild: every state linear, plus an explicit
      * count state so fully-retracted groups are detectable at read
      * time. */
    def retractSupported: Boolean =
      states.forall(_.retractable) && countStateName.isDefined
  }

  /** True iff serving an aggregate from the MV equals serving it from
    * the base: every base commit past the high-water mark is either a
    * CONTENT-PRESERVING layout rewrite (its recorded operation tag is
    * in [[TxTable.LayoutOps]] — optimize / z-order) or a data-less
    * mark. A pure append means missing rows; a merge / delete /
    * compact / retention / rollup / overwrite commit means the MV still
    * contains rows the base no longer has (or pre-merge values) — both
    * are staleness, and so is any range [[TxTable.expireLog]] already
    * swept (unverifiable → assume the worst). The projection-routing
    * rule ([[graft.plans.Projections]]) refuses to serve a query from a
    * stale MV: staleness degrades to the base scan, never to a wrong
    * answer.
    */
  def isCurrent(spark: SparkSession, baseTable: String,
      mvTable: String): Boolean = {
    val applied = lastApplied(spark, mvTable)
    val (fs, root) = TxTable.fsFor(spark, baseTable)
    val cur = TxTable.currentVersion(spark, baseTable)
    cur >= 0 && (cur == applied || {
      val (complete, newData, destructive) =
        TxTable.rangeSummary(fs, root, applied, cur)
      complete && !newData && !destructive
    })
  }

  def lastApplied(spark: SparkSession, mvTable: String): Long = {
    val (fs, root) = TxTable.fsFor(spark, mvTable)
    TxTable.txnHighWater(fs, root).getOrElse(WriterApp, -1L)
  }

  /** Fold the base table's un-applied commits into the MV. Pure-append
    * ranges apply INCREMENTALLY (read only the delta files); a range
    * containing only layout rewrites / marks advances the high-water
    * mark with a data-less commit; a range containing a DESTRUCTIVE
    * commit (merge / delete / compact / retention / rollup /
    * overwrite — anything that removed files without a layout tag), or
    * one partially swept by [[TxTable.expireLog]], cannot be applied
    * incrementally and triggers a full [[rebuild]] — incremental
    * maintenance under row removal would require retractable states.
    * Returns the MV commit version, or -1 when already up to date (or
    * when a concurrent refresher won the race — either way the MV
    * covers the versions this call saw).
    */
  def refresh(spark: SparkSession, baseTable: String, mvTable: String,
      mv: MvDef): Long = {
    val (bfs, broot) = TxTable.fsFor(spark, baseTable)
    val cur = TxTable.currentVersion(spark, baseTable)
    if (cur < 0) return -1L
    val last = lastApplied(spark, mvTable)
    if (cur <= last) return -1L
    // one parse per commit in range: classification + append delta
    // together (the same single-pass the streaming source uses)
    val (complete, destructive, delta) =
      TxTable.rangeDelta(bfs, broot, last, cur)
    if (!complete)
      return rebuild(spark, baseTable, mvTable, mv)
    if (destructive) {
      // RETRACTION instead of rebuild when every state is linear: the
      // change feed's deletes apply as NEGATIVE partials, so a
      // merge/delete/compact on the base costs O(touched files)
      // instead of a full scan. The commit also marks the MV table
      // with the tombstone property — fully-retracted groups survive
      // as zero-count state rows until [[compact]] collapses them, and
      // the projection route refuses to serve a tombstoned MV (a
      // coarser re-merge could surface a phantom zero-count group).
      // ONLY the typed feed-unreproducible failure (pre-images
      // reclaimed by a racing vacuum / swept log range) falls back to
      // the always-correct rebuild — anything else (a genuine bug in
      // partialRetract or appendTxn argument plumbing) PROPAGATES
      // instead of silently degrading every destructive commit to a
      // full scan forever.
      if (!mv.retractSupported) return rebuild(spark, baseTable, mvTable, mv)
      try {
        val cf = TxTable.changeFeed(spark, baseTable, last, cur)
        return TxTable.appendTxn(spark, mv.partialRetract(cf), mvTable,
          WriterApp, cur, expectMark = Some(last),
          propsSet = Seq(TombstoneProp -> "true"))
      } catch {
        case _: TxTable.ChangeFeedUnavailableException =>
          return rebuild(spark, baseTable, mvTable, mv)
      }
    }
    // every advance is a COMPARE-AND-SET on the high-water mark: two
    // refreshers that read the same `last` but different base heads
    // compute OVERLAPPING deltas — without CAS the later-versioned one
    // would land too and double-count the overlap; with it exactly one
    // advance from a given mark wins and the loser no-ops
    if (delta.isEmpty)
      return TxTable.commitTxnMark(spark, mvTable, WriterApp, cur,
        expectMark = Some(last))
    val rows = TxTable.readFileSet(spark, broot, delta,
      TxTable.logSchema(bfs, broot, Some(cur)))
    TxTable.appendTxn(spark, mv.partial(rows), mvTable, WriterApp, cur,
      expectMark = Some(last))
  }

  /** Full recompute: partial-aggregate the base's CURRENT snapshot and
    * atomically replace the MV's whole file set, high-water mark
    * included, in one commit ([[TxTable.overwriteTxn]]) — the recovery
    * path for destructive base history, and also what a FIRST refresh
    * over a base with past merges needs (the incremental feed skips
    * rewrite commits, so their files would otherwise never be seen).
    * Reads are pinned to one base version: a commit racing the rebuild
    * is simply the next refresh's work. Scale shape: one full base
    * scan — the same cost ClickHouse pays to POPULATE a view.
    */
  def rebuild(spark: SparkSession, baseTable: String, mvTable: String,
      mv: MvDef): Long = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DateType, StructField, StructType}
    val (bfs, broot) = TxTable.fsFor(spark, baseTable)
    val cur = TxTable.currentVersion(spark, baseTable)
    if (cur < 0) return -1L
    val live = TxTable.snapshotFiles(bfs, broot, Some(cur))
    val rows =
      if (live.nonEmpty)
        TxTable.readFileSet(spark, broot, live.toSeq,
          TxTable.logSchema(bfs, broot, Some(cur)))
      else {
        // base fully emptied: the MV's truth is zero groups
        val sch = TxTable.logSchema(bfs, broot, Some(cur)).getOrElse(
          throw new IllegalStateException(
            s"cannot rebuild MV over empty pre-evolution base $baseTable"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          StructType(StructField("date", DateType, true) +: sch.fields.toSeq))
      }
    TxTable.overwriteTxn(spark, mv.partial(rows), mvTable, WriterApp, cur,
      expectMark = Some(lastApplied(spark, mvTable)))
  }

  /** The finalized view: merge all stored partials. */
  /** MV table property marking that retraction tombstones (zero-count
    * state rows) may be present; set by the retract refresh, cleared
    * by [[compact]] after it collapses them. */
  val TombstoneProp = "graft.mv.tombstones"

  def read(spark: SparkSession, mvTable: String, mv: MvDef): DataFrame = {
    val f = mv.finish(TxTable.read(spark, mvTable))
    // a fully-retracted group nets to count 0 — present as state rows,
    // absent from the truth
    mv.countStateName.map(c => f.filter(col(c) =!= 0L)).getOrElse(f)
  }

  /** Collapse accumulated partial batches into one state row per group
    * (one atomic overwrite commit; high-water marks replay from the log
    * unaffected, so refresh keeps working after compaction). Fully-
    * retracted groups are dropped and the tombstone mark cleared IN THE
    * SAME COMMIT — a retract refresh landing after the overwrite keeps
    * its own freshly-set mark (a separate clear commit would erase it
    * while its zero-count state rows persist, letting the projection
    * route serve a phantom fully-retracted group).
    */
  def compact(spark: SparkSession, mvTable: String, mv: MvDef): Long = {
    val markBefore = lastApplied(spark, mvTable)
    val combined = mv.combine(TxTable.read(spark, mvTable))
    val pruned = mv.countStateName
      .map(c => combined.filter(col(c) =!= 0L)).getOrElse(combined)
    val v = TxTable.overwrite(spark, pruned, mvTable,
      propsRemove = Seq(TombstoneProp))
    // a refresh racing this compact (mark advanced since our read) may
    // have appended a retraction batch our overwrite left live while
    // clearing its tombstone mark — restore the mark conservatively
    // (projections stay off until the next compact; never a phantom)
    if (lastApplied(spark, mvTable) != markBefore)
      TxTable.setTableProperties(spark, mvTable,
        set = Seq(TombstoneProp -> "true"))
    v
  }
}
