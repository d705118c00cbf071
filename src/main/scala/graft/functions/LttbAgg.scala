package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ClickHouse's `largestTriangleThreeBuckets(n)(x, y)` (alias `lttb`)
  * — Steinarsson's LTTB downsampler, the shape-preserving series
  * reducer charting frontends ask an OLAP engine for: keep the first
  * and last points, split the middle into n−2 equal buckets, and from
  * each bucket keep the point forming the largest triangle with the
  * previously kept point and the NEXT bucket's centroid.
  *
  * State is the buffered (x, y) pairs — the algorithm is inherently
  * order-global per group, exactly like CH's own implementation, so
  * the memory contract is O(group size) and the operator is scoped to
  * charting-shaped groups (one series per group, bounded by the time
  * range). At 100 TB the pattern is: aggregate first (the summing
  * table's 60 s grain), downsample the aggregated series — never LTTB
  * over raw rows. The sort happens once per group at eval; ties on x
  * break by y so merge order never changes the answer.
  *
  * Result: array<struct<x: double, y: double>> in x order. n < 1
  * yields an empty array; n = 1 the first point; groups with ≤ n
  * points pass through unreduced (CH's behavior).
  */
case class LttbAgg(n: Int, x: Expression, y: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Double)]] {

  override def prettyName: String = "largestTriangleThreeBuckets"
  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false))),
    containsNull = false)

  private def numeric(dt: DataType) = dt match {
    case _: NumericType => true
    case _              => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (numeric(x.dataType) && numeric(y.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes numeric (x, y), got " +
        s"${x.dataType.simpleString}, ${y.dataType.simpleString}")

  override def createAggregationBuffer(): ArrayBuffer[(Double, Double)] =
    ArrayBuffer.empty

  private def asDouble(v: Any): Double = v match {
    case d: Double              => d
    case f: Float               => f.toDouble
    case l: Long                => l.toDouble
    case i: Int                 => i.toDouble
    case s: Short               => s.toDouble
    case b: Byte                => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalStateException(
      s"$prettyName: unexpected value $other")
  }

  override def update(buf: ArrayBuffer[(Double, Double)],
      input: InternalRow): ArrayBuffer[(Double, Double)] = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv != null && yv != null) buf += ((asDouble(xv), asDouble(yv)))
    buf
  }

  override def merge(a: ArrayBuffer[(Double, Double)],
      b: ArrayBuffer[(Double, Double)]): ArrayBuffer[(Double, Double)] =
    a ++= b

  override def eval(buf: ArrayBuffer[(Double, Double)]): Any = {
    val pts = buf.sortBy(identity).toIndexedSeq
    val kept: IndexedSeq[(Double, Double)] =
      if (n < 1 || pts.isEmpty) IndexedSeq.empty
      else if (n == 1) IndexedSeq(pts.head)
      else if (pts.size <= n || n == 2)
        if (n == 2 && pts.size > 2) IndexedSeq(pts.head, pts.last)
        else pts
      else {
        val out = ArrayBuffer(pts.head)
        // middle points split into n-2 equal (fractional) buckets
        val every = (pts.size - 2).toDouble / (n - 2).toDouble
        var a = 0 // index of the previously kept point
        var i = 0
        while (i < n - 2) {
          val bs = (i * every).toInt + 1
          val be = math.min(((i + 1) * every).toInt + 1, pts.size - 1)
          // centroid of the NEXT bucket (or the last point)
          val ns = be
          val ne = math.min(((i + 2) * every).toInt + 1, pts.size)
          var cx = 0.0
          var cy = 0.0
          var j = ns
          while (j < ne) { cx += pts(j)._1; cy += pts(j)._2; j += 1 }
          val cnt = math.max(ne - ns, 1)
          cx /= cnt
          cy /= cnt
          val (ax, ay) = pts(a)
          var best = bs
          var bestArea = -1.0
          j = bs
          while (j < be) {
            val (bx, by) = pts(j)
            val area = math.abs(
              (ax - cx) * (by - ay) - (ax - bx) * (cy - ay))
            if (area > bestArea) { bestArea = area; best = j }
            j += 1
          }
          out += pts(best)
          a = best
          i += 1
        }
        out += pts.last
        out.toIndexedSeq
      }
    new GenericArrayData(kept.map { case (px, py) =>
      InternalRow(px, py)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Double)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (a, b) => out.writeDouble(a); out.writeDouble(b) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : ArrayBuffer[(Double, Double)] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val sz = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Double)]
    var i = 0
    while (i < sz) {
      buf += ((in.readDouble(), in.readDouble()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): LttbAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LttbAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(x = newChildren(0), y = newChildren(1))
}
