package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** ClickHouse's `groupBitmapAnd/Or/Xor(bitmap)` under the Spark-native
  * reading: the argument is an integral ARRAY per row (the portable
  * analog of CH's roaring-bitmap state column), each row contributes
  * its element SET, and the rows fold by set intersection / union /
  * symmetric difference; the result is the fold's CARDINALITY (CH's
  * UInt64). All three folds are associative and commutative, so the
  * merge order of partial states never changes the answer and partial
  * aggregation runs map-side. NULL arrays skip; NULL elements skip;
  * zero contributing rows → 0 (And included — CH's empty-input
  * reading). State is O(|fold result|) for Or/Xor and bounded by the
  * SMALLEST row set for And.
  */
case class BitmapFoldAgg(child: Expression, kind: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Option[mutable.Set[Long]]] {

  require(BitmapFoldAgg.Kinds.contains(kind),
    s"unknown bitmap fold kind $kind")

  override def prettyName: String = s"groupBitmap$kind"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType | IntegerType | ShortType | ByteType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName takes an integral array " +
            s"(the bitmap's element set), got ${other.simpleString}")
    }

  private def elemLong(v: Any): Long = v match {
    case l: Long  => l
    case i: Int   => i.toLong
    case s: Short => s.toLong
    case b: Byte  => b.toLong
  }

  override def createAggregationBuffer(): Option[mutable.Set[Long]] = None

  private def rowSet(input: InternalRow): Option[mutable.Set[Long]] = {
    val v = child.eval(input)
    if (v == null) return None
    val arr = v.asInstanceOf[ArrayData]
    val s = mutable.Set.empty[Long]
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s += elemLong(arr.get(i, et))
      i += 1
    }
    Some(s)
  }

  private def fold(a: mutable.Set[Long], b: mutable.Set[Long])
      : mutable.Set[Long] = kind match {
    case "And" => a.filter(b.contains)
    case "Or"  => a ++= b
    case "Xor" =>
      b.foreach(x => if (a.contains(x)) a -= x else a += x)
      a
  }

  override def update(buf: Option[mutable.Set[Long]],
      input: InternalRow): Option[mutable.Set[Long]] =
    rowSet(input) match {
      case None    => buf
      case Some(s) => buf match {
        case None       => Some(s)
        case Some(prev) => Some(fold(prev, s))
      }
    }

  override def merge(a: Option[mutable.Set[Long]],
      b: Option[mutable.Set[Long]]): Option[mutable.Set[Long]] =
    (a, b) match {
      case (None, x)          => x
      case (x, None)          => x
      case (Some(x), Some(y)) => Some(fold(x, y))
    }

  override def eval(buf: Option[mutable.Set[Long]]): Any =
    buf.map(_.size.toLong).getOrElse(0L)

  override def serialize(buf: Option[mutable.Set[Long]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(buf.isDefined)
    buf.foreach { s =>
      out.writeInt(s.size)
      s.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : Option[mutable.Set[Long]] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    if (!in.readBoolean()) None
    else {
      val sz = in.readInt()
      val s = mutable.Set.empty[Long]
      var i = 0
      while (i < sz) { s += in.readLong(); i += 1 }
      Some(s)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapFoldAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapFoldAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object BitmapFoldAgg {
  val Kinds: Set[String] = Set("And", "Or", "Xor")
}
