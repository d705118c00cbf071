package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Partial state of the KLL/MRL-style quantile sketch: `levels(i)` holds
  * items each representing 2^i original inputs, `n` is the true input
  * count, `comps` counts compactions (drives the deterministic
  * alternating keep-offset, so runs are reproducible — the classic KLL
  * coin-flip is replaced by MRL-style alternation, trading a provably
  * unbiased estimator for determinism at the same O(log²(n)/k) rank
  * error envelope).
  */
case class KllBuffer(levels: Seq[Seq[Long]], n: Long, comps: Long)

/** Mergeable quantile sketch as a typed `Aggregator[Long, KllBuffer,
  * Seq[Long]]` — the 100 TB replacement for q19's exact rank-selection
  * quantiles (CoreQueries q19_quantiles), whose per-group sort/window
  * cannot scale past what one shuffle partition can hold.
  *
  * Shape (Karnin-Lang-Liberty 2016 / Manku-Rajagopalan-Lindsay 1998):
  * a ladder of buffers where level i items weigh 2^i. Level 0 collects
  * raw inputs; when any level reaches `k` items it is sorted and every
  * second item is promoted to the next level (the survivors' doubled
  * weight re-represents the discarded half). Sketch size is O(k log n)
  * regardless of input size; `merge` concatenates ladders level-wise
  * and re-compacts, so partial aggregation works map-side and the
  * exchange carries one small ladder per (group × partition) — never
  * the data.
  *
  * Rank error: each compaction at level i perturbs an item's rank by at
  * most 2^i, and each level compacts at most n/(k·2^i) times, giving
  * |est_rank − true_rank| = O(n·log²(n/k)/k) worst-case; with k=200 the
  * observed error at the spec's scales is well inside 2% of n
  * (PropertySpec asserts the bound against q19's exact answers).
  *
  * Buffer encoding: plain case class of Seq[Seq[Long]] — an
  * ExpressionEncoder keeps partials as Tungsten array<array<bigint>>
  * structs (no kryo blobs), mirroring [[TopKTalkers]].
  */
class KllQuantiles(probes: Seq[Double], k: Int = 200)
    extends Aggregator[Long, KllBuffer, Seq[Long]] {
  require(k >= 8, "capacity below 8 degenerates")
  require(probes.forall(p => p > 0 && p <= 1), "probes must be in (0,1]")

  override def zero: KllBuffer = KllBuffer(Seq(Vector.empty), 0L, 0L)

  override def reduce(buf: KllBuffer, v: Long): KllBuffer =
    carry(KllBuffer(
      buf.levels.updated(0, buf.levels.head :+ v), buf.n + 1, buf.comps))

  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = {
    val depth = math.max(a.levels.length, b.levels.length)
    val lv = (0 until depth).map { i =>
      a.levels.applyOrElse(i, (_: Int) => Vector.empty[Long]) ++
        b.levels.applyOrElse(i, (_: Int) => Vector.empty[Long])
    }
    carry(KllBuffer(lv, a.n + b.n, a.comps + b.comps))
  }

  /** Compact every over-full level, bottom-up (a promotion can overflow
    * the level above, like ripple-carry addition — hence the loop).
    */
  private def carry(buf0: KllBuffer): KllBuffer = {
    var buf = buf0
    var i = 0
    while (i < buf.levels.length) {
      if (buf.levels(i).length >= k) {
        val sorted = buf.levels(i).sorted
        // alternating offset: deterministic stand-in for KLL's coin flip
        val off = (buf.comps % 2).toInt
        val promoted = Vector.tabulate((sorted.length - off + 1) / 2)(j =>
          sorted(off + 2 * j))
        val lv0 = buf.levels.updated(i, Vector.empty[Long])
        val lv =
          if (i + 1 < lv0.length) lv0.updated(i + 1, lv0(i + 1) ++ promoted)
          else lv0 :+ promoted
        buf = KllBuffer(lv, buf.n, buf.comps + 1)
        // stay on level i+1: the promotion may have overflowed it
      }
      i += 1
    }
    buf
  }

  /** Weighted rank selection over the ladder: smallest value whose
    * cumulative weight reaches ceil(p·n) — the sketch analog of q19's
    * discrete lower-middle rank rule.
    */
  override def finish(buf: KllBuffer): Seq[Long] = {
    if (buf.n == 0) return probes.map(_ => 0L)
    val weighted = buf.levels.zipWithIndex.flatMap { case (items, lvl) =>
      items.map(v => (v, 1L << lvl))
    }.sortBy(_._1)
    probes.map { p =>
      val target = math.max(1L, math.ceil(p * buf.n).toLong)
      var cum = 0L
      var ans = weighted.last._1
      var i = 0
      var found = false
      while (i < weighted.length && !found) {
        cum += weighted(i)._2
        if (cum >= target) { ans = weighted(i)._1; found = true }
        i += 1
      }
      ans
    }
  }

  override def bufferEncoder: Encoder[KllBuffer] = Encoders.product[KllBuffer]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** The -State combinator over [[KllQuantiles]]: aggregates raw longs but
  * FINISHES with the sketch buffer itself (Tungsten
  * struct<levels:array<array<bigint>>,n:bigint,comps:bigint>), so a
  * materialized view can store per-group partial sketches as a parquet
  * column — ClickHouse's `quantileState` into an AggregatingMergeTree.
  */
class KllState(k: Int = 200) extends Aggregator[Long, KllBuffer, KllBuffer] {
  private val inner = new KllQuantiles(Seq(0.5), k)
  override def zero: KllBuffer = inner.zero
  override def reduce(b: KllBuffer, v: Long): KllBuffer = inner.reduce(b, v)
  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = inner.merge(a, b)
  override def finish(b: KllBuffer): KllBuffer = b
  override def bufferEncoder: Encoder[KllBuffer] = Encoders.product[KllBuffer]
  override def outputEncoder: Encoder[KllBuffer] = Encoders.product[KllBuffer]
}

/** The -Merge combinator: folds stored [[KllBuffer]] states back into one
  * sketch and emits the quantiles — `quantileMerge` at MV read time. The
  * same ladder algebra as ingest-time aggregation, so incremental
  * (state-per-batch, merged later) and one-shot aggregation share one
  * error envelope.
  */
class KllMerge(probes: Seq[Double], k: Int = 200)
    extends Aggregator[KllBuffer, KllBuffer, Seq[Long]] {
  private val inner = new KllQuantiles(probes, k)
  override def zero: KllBuffer = inner.zero
  override def reduce(acc: KllBuffer, st: KllBuffer): KllBuffer =
    inner.merge(acc, st)
  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = inner.merge(a, b)
  override def finish(b: KllBuffer): Seq[Long] = inner.finish(b)
  override def bufferEncoder: Encoder[KllBuffer] = Encoders.product[KllBuffer]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
