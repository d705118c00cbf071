package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared element codec for the small array aggregates below:
  * integral/string elements only (the CrossTabAgg restriction — set
  * semantics over continuous doubles are a float-equality trap).
  * Internal representation is Long or String; [[out]] converts back
  * to the child's external type.
  */
private[functions] trait ElementCodec {
  def elem: Expression

  protected def elemOk(dt: DataType): Boolean = Set[DataType](LongType,
    IntegerType, ShortType, ByteType, StringType)(dt)

  protected def keyOf(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case i: Int        => i.toLong
    case s: Short      => s.toLong
    case b: Byte       => b.toLong
    case l: Long       => l
    case other         => other.toString
  }

  protected def isStr: Boolean = elemDt == StringType

  protected def elemDt: DataType = elem.dataType match {
    case ArrayType(et, _) => et
    case dt               => dt
  }

  /** internal Long/String back to the element's external form. */
  protected def out(v: Any): Any = (v, elemDt) match {
    case (s: String, _)        => UTF8String.fromString(s)
    case (l: Long, LongType)   => l
    case (l: Long, IntegerType) => l.toInt
    case (l: Long, ShortType)  => l.toShort
    case (l: Long, ByteType)   => l.toByte
    case (v, _)                => v
  }

  protected def writeElem(o: java.io.DataOutputStream, v: Any): Unit =
    v match {
      case s: String => o.writeUTF(s)
      case l: Long   => o.writeLong(l)
      case other     => o.writeUTF(other.toString)
    }

  protected def readElem(i: java.io.DataInputStream): Any =
    if (isStr) i.readUTF() else i.readLong()

  protected def ordering: Ordering[Any] =
    if (isStr) Ordering.String.on[Any](_.asInstanceOf[String])
    else Ordering.Long.on[Any](_.asInstanceOf[Long])
}

/** CH `groupArraySorted(N)(x)` — the N SMALLEST values, ascending.
  * State is a bounded max-heap of size N — O(N) however large the
  * group (CH keeps the same bound), so partial aggregation ships N
  * values per partition, never the group. */
case class GroupArraySorted(n: Int, elem: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
    with ElementCodec {

  require(n > 0, s"groupArraySorted N must be positive, got $n")

  override def prettyName: String = "groupArraySorted"
  override def children: Seq[Expression] = Seq(elem)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(elemDt, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemOk(elem.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes integral/string values, " +
        s"got ${elem.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ordering) // max-heap of smallest N

  private def offer(buf: mutable.PriorityQueue[Any], v: Any): Unit =
    if (buf.size < n) buf.enqueue(v)
    else if (ordering.lt(v, buf.head)) { buf.dequeue(); buf.enqueue(v) }

  override def update(buf: mutable.PriorityQueue[Any],
      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = elem.eval(input)
    if (v != null) offer(buf, keyOf(v))
    buf
  }

  override def merge(a: mutable.PriorityQueue[Any],
      b: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(
      buf.toIndexedSeq.sorted(ordering).map(out).toArray[Any])

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    o.writeInt(buf.size)
    buf.foreach(writeElem(o, _))
    o.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[Any] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val sz = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < sz) { buf.enqueue(readElem(in)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GroupArraySorted =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupArraySorted =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(elem = newChildren(0))
}

/** CH `groupArrayIntersect(arr)` — the elements present in EVERY
  * row's array. State is the running intersection — it only ever
  * SHRINKS, so partial aggregation ships at most the first row's
  * distinct elements. Result sorted ascending (CH leaves the order
  * unspecified; a deterministic order is strictly stronger). NULL
  * arrays skip; a group with no arrays yields an empty result. */
case class GroupArrayIntersect(elem: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[mutable.Set[Any]]]
    with ElementCodec {

  override def prettyName: String = "groupArrayIntersect"
  override def children: Seq[Expression] = Seq(elem)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(elemDt, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    elem.dataType match {
      case ArrayType(et, _) if elemOk(et) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName takes an array of " +
            s"integral/string values, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Option[mutable.Set[Any]] = None

  private def rowSet(v: Any): mutable.Set[Any] = {
    val arr = v.asInstanceOf[ArrayData]
    val s = mutable.Set.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      val e = arr.get(i, elemDt)
      if (e != null) s += keyOf(e)
      i += 1
    }
    s
  }

  override def update(buf: Option[mutable.Set[Any]],
      input: InternalRow): Option[mutable.Set[Any]] = {
    val v = elem.eval(input)
    if (v == null) buf
    else buf match {
      case None    => Some(rowSet(v))
      case Some(s) => val r = rowSet(v); s.filterInPlace(r); Some(s)
    }
  }

  override def merge(a: Option[mutable.Set[Any]],
      b: Option[mutable.Set[Any]]): Option[mutable.Set[Any]] =
    (a, b) match {
      case (None, x)            => x
      case (x, None)            => x
      case (Some(x), Some(y))   => x.filterInPlace(y); Some(x)
    }

  override def eval(buf: Option[mutable.Set[Any]]): Any =
    new GenericArrayData(buf.getOrElse(mutable.Set.empty[Any])
      .toIndexedSeq.sorted(ordering).map(out).toArray[Any])

  override def serialize(buf: Option[mutable.Set[Any]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    o.writeBoolean(buf.isDefined)
    buf.foreach { s =>
      o.writeInt(s.size)
      s.foreach(writeElem(o, _))
    }
    o.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : Option[mutable.Set[Any]] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    if (!in.readBoolean()) None
    else {
      val sz = in.readInt()
      val s = mutable.Set.empty[Any]
      var i = 0
      while (i < sz) { s += readElem(in); i += 1 }
      Some(s)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): GroupArrayIntersect =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupArrayIntersect =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(elem = newChildren(0))
}
