package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's map-combining aggregates `sumMap` / `minMap` / `maxMap`
  * over the classic two-array spelling: each input row carries a keys
  * array and a same-length values array; the aggregate combines values
  * PER KEY across rows and returns the CH tuple shape — a struct of
  * (sorted keys, combined values). The monitoring staple: per-row
  * metric breakdowns (`{status -> count}`) summed into one breakdown
  * per group.
  *
  * Semantics match CH: a key absent from a row simply does not
  * participate (minMap never sees a phantom 0), keys sort ascending in
  * the output, and NULL entries (either side) are skipped. State is
  * O(distinct keys) with map-side partial aggregation — the exchange
  * carries combined maps, never the row-level pairs (the explode +
  * groupBy formulation would shuffle |rows| × |keys| rows).
  *
  * Key types: long/int/string; values: long/double. Anything else is
  * refused at analysis, not silently stringified.
  */
case class MapCombineAgg(op: String, keys: Expression, values: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.Map[Any, Any]] {

  require(Set("sum", "min", "max")(op), s"unknown map-combine op $op")

  private def keyType: DataType =
    keys.dataType.asInstanceOf[ArrayType].elementType
  private def valType: DataType =
    values.dataType.asInstanceOf[ArrayType].elementType

  override def prettyName: String = s"${op}Map"
  override def children: Seq[Expression] = Seq(keys, values)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("keys", ArrayType(keyType, containsNull = false),
      nullable = false),
    StructField("vals", ArrayType(valType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (keys.dataType, values.dataType) match {
      case (ArrayType(kt, _), ArrayType(vt, _)) =>
        Set[DataType](StringType, LongType, IntegerType)(kt) &&
          Set[DataType](LongType, DoubleType)(vt)
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"${op}Map takes (array<string|long|int>, " +
        s"array<long|double>), got ${keys.dataType.simpleString}, " +
        values.dataType.simpleString)
  }

  override def createAggregationBuffer(): mutable.Map[Any, Any] =
    mutable.Map.empty

  private def combine(a: Any, b: Any): Any = (op, a, b) match {
    case ("sum", x: Long, y: Long)     => x + y
    case ("sum", x: Double, y: Double) => x + y
    case ("min", x: Long, y: Long)     => math.min(x, y)
    case ("min", x: Double, y: Double) => math.min(x, y)
    case ("max", x: Long, y: Long)     => math.max(x, y)
    case ("max", x: Double, y: Double) => math.max(x, y)
    case _ => throw new IllegalStateException(s"bad combine $op($a, $b)")
  }

  private def canonical(k: Any): Any = k match {
    case u: UTF8String => u.toString
    case other         => other
  }

  private def put(buf: mutable.Map[Any, Any], k: Any, v: Any): Unit =
    buf.get(k) match {
      case Some(prev) => buf.update(k, combine(prev, v))
      case None       => buf.update(k, v)
    }

  override def update(buf: mutable.Map[Any, Any],
      input: InternalRow): mutable.Map[Any, Any] = {
    val ka = keys.eval(input).asInstanceOf[ArrayData]
    val va = values.eval(input).asInstanceOf[ArrayData]
    if (ka != null && va != null) {
      require(ka.numElements() == va.numElements(),
        s"${op}Map: keys and values arrays differ in length " +
          s"(${ka.numElements()} vs ${va.numElements()})")
      var i = 0
      while (i < ka.numElements()) {
        if (!ka.isNullAt(i) && !va.isNullAt(i))
          put(buf, canonical(ka.get(i, keyType)), va.get(i, valType))
        i += 1
      }
    }
    buf
  }

  override def merge(a: mutable.Map[Any, Any],
      b: mutable.Map[Any, Any]): mutable.Map[Any, Any] = {
    b.foreach { case (k, v) => put(a, k, v) }
    a
  }

  override def eval(buf: mutable.Map[Any, Any]): Any = {
    val sorted = keyType match {
      case StringType  => buf.toSeq.sortBy(_._1.asInstanceOf[String])
      case LongType    => buf.toSeq.sortBy(_._1.asInstanceOf[Long])
      case IntegerType => buf.toSeq.sortBy(_._1.asInstanceOf[Int])
    }
    val ks: Array[Any] = sorted.map {
      case (k: String, _) => UTF8String.fromString(k)
      case (k, _)         => k
    }.toArray
    val vs: Array[Any] = sorted.map(_._2).toArray
    new GenericInternalRow(Array[Any](
      ArrayData.toArrayData(ks), ArrayData.toArrayData(vs)))
  }

  override def serialize(buf: mutable.Map[Any, Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      keyType match {
        case StringType =>
          val b = k.asInstanceOf[String]
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          out.writeInt(b.length); out.write(b)
        case LongType    => out.writeLong(k.asInstanceOf[Long])
        case IntegerType => out.writeInt(k.asInstanceOf[Int])
      }
      valType match {
        case LongType   => out.writeLong(v.asInstanceOf[Long])
        case DoubleType => out.writeDouble(v.asInstanceOf[Double])
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.Map[Any, Any] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.Map.empty[Any, Any]
    var i = 0
    while (i < n) {
      val k: Any = keyType match {
        case StringType =>
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          new String(b, java.nio.charset.StandardCharsets.UTF_8)
        case LongType    => in.readLong()
        case IntegerType => in.readInt()
      }
      val v: Any = valType match {
        case LongType   => in.readLong()
        case DoubleType => in.readDouble()
      }
      buf.update(k, v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MapCombineAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MapCombineAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(keys = newChildren(0), values = newChildren(1))
}
