package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** CH's `-ForEach` aggregate combinator for the dashboard staples —
  * `sumForEach` / `minForEach` / `maxForEach` / `avgForEach`(arr):
  * the aggregate applied ELEMENT-WISE across the rows' arrays, the
  * vector-accumulation shape (per-dimension totals over embedding or
  * histogram columns).
  *
  * State is one accumulator per element position — O(max array
  * length), independent of row count, merged position-wise, so
  * partials combine map-side and 100 TB of arrays ship max-dim
  * doubles per partition. Ragged inputs follow CH: each position
  * aggregates over the rows that HAVE it (sums treat absent as 0,
  * min/max/avg simply skip), so the result length is the group's max
  * length. All math in double; NULL arrays skip, NULL elements are
  * rejected loudly (an element-wise aggregate over a null hole has no
  * honest reading).
  */
case class ForEachAgg(kind: String, child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(ForEachAgg.Kinds(kind), s"unknown ForEach kind $kind")

  override def prettyName: String = s"${kind}ForEach"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case dt               => dt
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: NumericType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName takes a numeric array, got " +
            other.simpleString)
    }

  // (value accumulator, contributing-row count) per position
  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def combine(a: Double, b: Double): Double = kind match {
    case "sum" | "avg" => a + b
    case "min"         => math.min(a, b)
    case "max"         => math.max(a, b)
  }

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

  private def accumulate(buf: ArrayBuffer[(Double, Long)], i: Int,
      v: Double, n: Long): Unit =
    if (i < buf.size) buf(i) = (combine(buf(i)._1, v), buf(i)._2 + n)
    else buf += ((v, n))

  override def update(buf: ArrayBuffer[(Double, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val e = arr.get(i, elemType)
        if (e == null) throw new IllegalArgumentException(
          s"$prettyName: array contains a NULL element")
        accumulate(buf, i, asD(e), 1L)
        i += 1
      }
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Double, Long)],
      b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    var i = 0
    while (i < b.size) {
      accumulate(a, i, b(i)._1, b(i)._2)
      i += 1
    }
    a
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (v, n) =>
      (if (kind == "avg") v / n else v): Any
    }.toArray)

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (v, n) => bb.putDouble(v); bb.putLong(n) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : ArrayBuffer[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ForEachAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ForEachAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object ForEachAgg {
  val Kinds: Set[String] = Set("sum", "min", "max", "avg")
}
