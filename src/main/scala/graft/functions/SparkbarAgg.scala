package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CH `sparkbar(buckets[, min_x, max_x])(x, y)` — the inline unicode
  * bar chart: bucket the x range into `buckets` equal bins, sum y per
  * bin, render one character per bin from the eight-step block ramp
  * ▁▂▃▄▅▆▇█.
  *
  * Rendering contract (documented precisely so an engine replay can
  * reproduce the string): bin index = min(B−1,
  * ⌊(x − min_x)·B/(max_x − min_x)⌋) — with explicit bounds,
  * out-of-range x drops (CH's behavior); without them the data
  * min/max anchor the axis. A bin with no rows or non-positive sum
  * renders a SPACE; a positive bin renders level
  * max(1, min(8, ⌈sum·8/max_sum⌉)) — any positive sum shows at least
  * ▁ and only the max bin reaches █. Negative y contributions are
  * summed as-is (a net-negative bin is a space), min_x = max_x
  * degenerates to one bin.
  *
  * State is an x → Σy map — O(distinct x), the same budget CH's own
  * buffer pays (x is a time bucket in every real use), merged by
  * per-key addition so partials combine map-side.
  */
case class SparkbarAgg(buckets: Int, minMax: Option[(Double, Double)],
    x: Expression, y: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.Map[Double, Double]] {

  require(buckets > 0 && buckets <= 1024,
    s"sparkbar takes 1..1024 buckets, got $buckets")
  minMax.foreach { case (lo, hi) => require(lo <= hi,
    s"sparkbar needs min_x <= max_x, got $lo, $hi") }

  override def prettyName: String = "sparkbar"
  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[NumericType]))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes numeric (x, y), got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def createAggregationBuffer(): mutable.Map[Double, Double] =
    mutable.Map.empty

  private def asD(v: Any): Double = v match {
    case d: Double => d
    case f: Float  => f.toDouble
    case l: Long   => l.toDouble
    case i: Int    => i.toDouble
    case s: Short  => s.toDouble
    case b: Byte   => b.toDouble
    case d: Decimal => d.toDouble
    case other => throw new IllegalStateException(
      s"$prettyName: unexpected value $other")
  }

  override def update(buf: mutable.Map[Double, Double],
      input: InternalRow): mutable.Map[Double, Double] = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv != null && yv != null) {
      val xd = asD(xv)
      val inRange = minMax.forall { case (lo, hi) => xd >= lo && xd <= hi }
      if (inRange) buf.update(xd, buf.getOrElse(xd, 0.0) + asD(yv))
    }
    buf
  }

  override def merge(a: mutable.Map[Double, Double],
      b: mutable.Map[Double, Double]): mutable.Map[Double, Double] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0.0) + v) }
    a
  }

  override def eval(buf: mutable.Map[Double, Double]): Any = {
    if (buf.isEmpty) return UTF8String.fromString("")
    val (lo, hi) = minMax.getOrElse((buf.keys.min, buf.keys.max))
    val sums = new Array[Double](buckets)
    buf.foreach { case (xd, s) =>
      val idx =
        if (hi == lo) 0
        else math.min(buckets - 1,
          math.floor((xd - lo) * buckets / (hi - lo)).toInt)
      sums(idx) += s
    }
    val maxSum = sums.max
    val sb = new java.lang.StringBuilder(buckets)
    sums.foreach { s =>
      if (s <= 0 || maxSum <= 0) sb.append(' ')
      else {
        val level = math.max(1, math.min(8,
          math.ceil(s * 8.0 / maxSum).toInt))
        sb.append((0x2580 + level).toChar)
      }
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: mutable.Map[Double, Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (k, v) => bb.putDouble(k); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.Map[Double, Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.Map.empty[Double, Double]
    var i = 0
    while (i < n) { buf.update(bb.getDouble, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): SparkbarAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SparkbarAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(x = newChildren(0), y = newChildren(1))
}
