package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (`Aggregator[IN, BUF, OUT]`): bounded top-k
  * heavy-talkers sketch — a space-saving summary that keeps at most
  * `cap` keys per partial buffer, so driver/exchange memory is bounded
  * regardless of key cardinality. The scale-out extension slot
  * SURVEY.md §2.9 reserves (heavy-hitter talkers without a full
  * groupBy over every (pod, remote) pair).
  *
  * Exact when the true key cardinality <= cap (the spec case and the
  * oracle-gated q_topk_talkers). Beyond cap it follows the classic
  * space-saving rule: a NEW key evicts the current minimum and INHERITS
  * its count (overestimate bounded by the evicted minimum — a true
  * heavy hitter cannot be silently zeroed, unlike plain truncation).
  * Like any streaming sketch, over-cap results depend on arrival/merge
  * order; only the under-cap regime is deterministic.
  */
class TopKTalkers(k: Int, cap: Int = 1024)
    extends Aggregator[(String, Long), Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], in: (String, Long)): Map[String, Long] =
    if (buf.contains(in._1) || buf.size < cap)
      buf.updated(in._1, buf.getOrElse(in._1, 0L) + in._2)
    else {
      // space-saving eviction: replace the minimum, inherit its count
      val (minKey, minV) = buf.minBy { case (key, v) => (v, key) }
      (buf - minKey).updated(in._1, minV + in._2)
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    shrink(b.foldLeft(a) { case (acc, (key, v)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + v)
    })

  /** Merging two summaries sums common keys then keeps the top `cap`,
    * folding the LARGEST dropped count into the kept minimum. That
    * preserves the space-saving overestimate invariant across merges
    * (any dropped key's true count <= the kept minimum), so the "a true
    * heavy hitter cannot be silently zeroed" guarantee holds in the
    * over-cap regime too — plain truncation would break it exactly at
    * partial-buffer merge boundaries. */
  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= cap) m
    else {
      val sorted = m.toSeq.sortBy { case (key, v) => (-v, key) }
      val kept = sorted.take(cap)
      val (minKey, minV) = kept.last
      (kept.init :+ (minKey -> (minV + sorted(cap)._2))).toMap
    }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (key, v) => (-v, key) }.take(k)

  // ExpressionEncoders (not kryo): the buffer stays a Tungsten map/array
  // struct — visible to the planner and off the opaque-binary path
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
