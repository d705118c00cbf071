package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse `topK(k)(x)` — the k most frequent values, via the
  * space-saving heavy-hitters sketch (the same algorithm CH documents:
  * bounded state, a new key evicts the current minimum and INHERITS
  * its count, so a true heavy hitter is never silently zeroed).
  * EXACT whenever the true cardinality fits the buffer (capacity =
  * max(8k, 256), CH's load-factor idea) — which is what makes the
  * driver gate hash-checkable on a low-cardinality column. Ordering is
  * deterministic: count descending, value ascending on ties (CH leaves
  * ties unspecified; a distributed engine wants a stable answer).
  *
  * String/long/int children cover the CH dashboard uses; other types
  * are refused at analysis, not silently stringified.
  */
case class TopKAgg(k: Int, child: Expression,
    weight: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.Map[String, Long]] {

  private val cap = math.max(8 * k, 256)

  override def prettyName: String =
    if (weight.isDefined) "topKWeighted" else "topK"
  override def children: Seq[Expression] = child +: weight.toSeq
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType,
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"topK supports string/long/int arguments, got " +
              dt.simpleString)
    }

  override def createAggregationBuffer(): mutable.Map[String, Long] =
    mutable.Map.empty

  private def keyOf(v: Any): String = v match {
    case u: UTF8String => u.toString
    case other         => other.toString
  }

  private def add(buf: mutable.Map[String, Long], key: String,
      n: Long): Unit =
    if (buf.contains(key) || buf.size < cap)
      buf.update(key, buf.getOrElse(key, 0L) + n)
    else {
      val (minKey, minV) = buf.minBy { case (kk, v) => (v, kk) }
      buf.remove(minKey)
      buf.update(key, minV + n)
    }

  override def update(buf: mutable.Map[String, Long],
      input: InternalRow): mutable.Map[String, Long] = {
    val v = child.eval(input)
    // topKWeighted: each row counts `weight` instead of 1 (CH's
    // spelling for pre-aggregated frequencies); NULL weight = skip
    val n = weight match {
      case None => 1L
      case Some(w) => w.eval(input) match {
        case null       => 0L
        case x: Long    => x
        case x: Int     => x.toLong
        case other      => throw new IllegalStateException(
          s"topKWeighted weight must be integral, got $other")
      }
    }
    if (v != null && n > 0) add(buf, keyOf(v), n)
    buf
  }

  override def merge(a: mutable.Map[String, Long],
      b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (kk, v) => add(a, kk, v) }
    a
  }

  override def eval(buf: mutable.Map[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (kk, v) => (-v, kk) }.take(k)
    val vals: Array[Any] = top.map { case (kk, _) =>
      child.dataType match {
        case StringType  => UTF8String.fromString(kk)
        case LongType    => kk.toLong
        case IntegerType => kk.toInt
      }
    }.toArray
    ArrayData.toArrayData(vals)
  }

  // Keys go length-prefixed UTF-8, NOT writeUTF: writeUTF caps at
  // 65535 encoded bytes and would crash the partial-agg shuffle on a
  // topK over long strings.
  override def serialize(buf: mutable.Map[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (kk, v) =>
      val b = kk.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.Map[String, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.Map.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head,
      weight = weight.map(_ => newChildren(1)))
}
