package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Shared machinery for the sweep-line interval aggregates
  * (ClickHouse's maxIntersections family and intervalLengthSum): the
  * state is a boundary-point → net-delta map — O(distinct boundaries),
  * never O(rows) — and merges by summing deltas per point, so partial
  * aggregation runs map-side and the exchange carries combined sweeps.
  * The O(b log b) sort happens once per group at eval, driver-free.
  * (A collect_list formulation would shuffle every row and sort on one
  * thread.) NULL on either side skips the row.
  */
trait BoundaryDeltaAgg
    extends TypedImperativeAggregate[mutable.Map[Long, Long]] {
  def start: Expression
  def end: Expression

  override def children: Seq[Expression] = Seq(start, end)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(start, end).forall(e =>
      Set[DataType](LongType, IntegerType)(e.dataType))
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes integral (start, end), got " +
        s"${start.dataType.simpleString}, ${end.dataType.simpleString}")
  }

  override def createAggregationBuffer(): mutable.Map[Long, Long] =
    mutable.Map.empty

  private def toLong(e: Expression, v: Any): Long = v match {
    case l: Long => l
    case i: Int  => i.toLong
    case other   => throw new IllegalStateException(
      s"$prettyName: unexpected value $other for ${e.dataType}")
  }

  private def bump(buf: mutable.Map[Long, Long], p: Long, d: Long): Unit =
    buf.update(p, buf.getOrElse(p, 0L) + d)

  override def update(buf: mutable.Map[Long, Long],
      input: InternalRow): mutable.Map[Long, Long] = {
    val s = start.eval(input)
    val e = end.eval(input)
    if (s != null && e != null) {
      bump(buf, toLong(start, s), 1L)
      bump(buf, toLong(end, e), -1L)
    }
    buf
  }

  override def merge(a: mutable.Map[Long, Long],
      b: mutable.Map[Long, Long]): mutable.Map[Long, Long] = {
    b.foreach { case (p, d) => bump(a, p, d) }
    a
  }

  override def serialize(buf: mutable.Map[Long, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (p, d) => out.writeLong(p); out.writeLong(d) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.Map[Long, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.Map.empty[Long, Long]
    var i = 0
    while (i < n) { buf.update(in.readLong(), in.readLong()); i += 1 }
    buf
  }
}

/** ClickHouse `maxIntersections(start, end)` /
  * `maxIntersectionsPosition(start, end)` — the sweep-line pair: the
  * maximum number of input intervals that overlap at any single
  * point, and the leftmost point where that maximum is attained. The
  * monitoring staple behind "peak concurrent flows/connections in
  * this window" (each flow contributes its [first_seen, last_seen)
  * interval).
  *
  * Contract (matches CH's point-sort, where an interval's `-1` end
  * event sorts before a coincident `+1` start): intervals are
  * HALF-OPEN — [1,2] and [2,3] do not intersect. Empty input
  * evaluates to 0 (count) / NULL (position).
  */
case class MaxIntersectionsAgg(start: Expression, end: Expression,
    position: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BoundaryDeltaAgg {

  override def prettyName: String =
    if (position) "maxIntersectionsPosition" else "maxIntersections"
  override def nullable: Boolean = position
  override def dataType: DataType = LongType

  override def eval(buf: mutable.Map[Long, Long]): Any = {
    if (buf.isEmpty) return if (position) null else 0L
    // Ascending point order with the NET delta applied at each point:
    // equivalent to processing coincident -1s before +1s (the
    // half-open contract), because within one point the running value
    // peaks after all its deltas land.
    val pts = buf.toArray.sortBy(_._1)
    var running = 0L
    var best = 0L
    var bestAt: java.lang.Long = null
    pts.foreach { case (p, d) =>
      running += d
      if (running > best) { best = running; bestAt = p }
    }
    if (position) bestAt else best
  }

  override def withNewMutableAggBufferOffset(o: Int): MaxIntersectionsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MaxIntersectionsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(start = newChildren(0), end = newChildren(1))
}

/** ClickHouse `intervalLengthSum(start, end)` — the total length of
  * the UNION of the input intervals (overlaps counted once, touching
  * segments coalesce — union length is orientation-free, so the
  * half-open question doesn't arise). Same boundary-delta state as
  * [[MaxIntersectionsAgg]]; eval sums the gaps between consecutive
  * boundary points while the running interval count is positive.
  * Empty input evaluates to 0.
  */
case class IntervalLengthSumAgg(start: Expression, end: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends BoundaryDeltaAgg {

  override def prettyName: String = "intervalLengthSum"
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def eval(buf: mutable.Map[Long, Long]): Any = {
    if (buf.isEmpty) return 0L
    val pts = buf.toArray.sortBy(_._1)
    var running = 0L
    var total = 0L
    var i = 0
    while (i < pts.length) {
      running += pts(i)._2
      if (running > 0 && i + 1 < pts.length)
        total += pts(i + 1)._1 - pts(i)._1
      i += 1
    }
    total
  }

  override def withNewMutableAggBufferOffset(o: Int): IntervalLengthSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): IntervalLengthSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(start = newChildren(0), end = newChildren(1))
}
