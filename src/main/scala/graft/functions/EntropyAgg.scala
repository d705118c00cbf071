package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse `entropy(x)` — EXACT Shannon entropy of the value
  * distribution, in bits (log2, the CH convention; DuckDB's `entropy`
  * agrees, which is what makes the oracle a one-liner):
  * H = −Σ (c_v/n) · log2(c_v/n) over the distinct values' counts.
  *
  * State is a value → count map — O(distinct values), never O(rows) —
  * merged by summing counts per value, so partial aggregation runs
  * map-side and the exchange carries combined histograms (the same
  * scale shape as sumMap / the interval sweeps). NULLs skip (CH counts
  * them as a value only via the -OrNull combinators, which this
  * surface doesn't spell). Empty input evaluates to 0.0, matching CH.
  *
  * Input is restricted to the key-able types the queries actually use
  * (integral / string / boolean / date); continuous doubles would make
  * "distinct value" a float-equality trap, and CH users bucket first
  * anyway.
  */
case class EntropyAgg(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.Map[Any, Long]] {

  override def prettyName: String = "entropy"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  private def isString = child.dataType == StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Set[DataType](LongType, IntegerType, ShortType, ByteType,
      BooleanType, DateType, StringType)(child.dataType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("entropy takes an integral/string/boolean/date " +
        s"column, got ${child.dataType.simpleString} (bucket continuous " +
        "values first)")
  }

  override def createAggregationBuffer(): mutable.Map[Any, Long] =
    mutable.Map.empty

  /** Normalize to a stable map key: numerics widen to Long, strings
    * COPY out of Spark's reused UTF8String buffers. */
  private def keyOf(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case i: Int        => i.toLong
    case s: Short      => s.toLong
    case b: Byte       => b.toLong
    case b: Boolean    => if (b) 1L else 0L
    case l: Long       => l
    case other         => other.toString
  }

  override def update(buf: mutable.Map[Any, Long],
      input: InternalRow): mutable.Map[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = keyOf(v)
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(a: mutable.Map[Any, Long],
      b: mutable.Map[Any, Long]): mutable.Map[Any, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    a
  }

  override def eval(buf: mutable.Map[Any, Long]): Any = {
    if (buf.isEmpty) return 0.0
    val n = buf.valuesIterator.sum.toDouble
    var h = 0.0
    buf.valuesIterator.foreach { c =>
      val p = c / n
      h -= p * (math.log(p) / math.log(2.0))
    }
    h
  }

  override def serialize(buf: mutable.Map[Any, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(isString)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      if (isString) out.writeUTF(k.asInstanceOf[String])
      else out.writeLong(k.asInstanceOf[Long])
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.Map[Any, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val str = in.readBoolean()
    val n = in.readInt()
    val buf = mutable.Map.empty[Any, Long]
    var i = 0
    while (i < n) {
      val k: Any = if (str) in.readUTF() else in.readLong()
      buf.update(k, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): EntropyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): EntropyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
