package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's `sequenceNextNode(direction, base)(ts, event_column,
  * base_condition, event1, ..., eventN)` — the clickstream
  * what-came-next aggregate: anchor a base event, verify the event
  * chain runs from it in `direction`, and return the event_column
  * value of the node right AFTER the chain (NULL when the chain
  * doesn't match or runs off the group).
  *
  * Supported (direction, base) pairs are the four canonical ones —
  * ('forward','head'), ('backward','tail'), ('forward','first_match'),
  * ('backward','last_match'); anything else refuses loudly at
  * translation. Semantics, uniform across the four: with scan step
  * d = +1 (forward) or −1 (backward) over the ts-sorted events,
  * base_condition AND event1 must hold at the base index, event_i at
  * base + (i−1)·d, and the result is the value at base + N·d.
  * `first_match`/`last_match` pick the first/last index (in ts order)
  * where base_condition AND event1 hold.
  *
  * State buffers (ts, value, condition bitmask) per event — the
  * algorithm is order-global per group exactly like CH's (which
  * buffers the same triple); unlike the windowFunnel family,
  * non-matching events CANNOT be dropped, because any event can be
  * the returned next node. Memory contract is therefore O(group
  * size): clickstream-shaped groups (one user's session), never a
  * whole-table group. Ties on ts break by value so merge order never
  * changes the answer.
  */
case class SequenceNextNode(forward: Boolean, base: String,
    ts: Expression, value: Expression, baseCond: Expression,
    events: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Long, String, Int)]] {

  require(Set("head", "tail", "first_match", "last_match")(base),
    s"unknown sequenceNextNode base $base")
  require(events.nonEmpty && events.size <= 30,
    s"sequenceNextNode takes 1..30 event conditions, got ${events.size}")

  override def prettyName: String = "sequenceNextNode"
  override def children: Seq[Expression] =
    Seq(ts, value, baseCond) ++ events
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val tsOk = ts.dataType == TimestampType ||
      ts.dataType == TimestampNTZType || ts.dataType == LongType
    if (!tsOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName needs a timestamp (or " +
          s"epoch-micros long) first argument, got " +
          ts.dataType.simpleString)
    else if (value.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName event_column must be a string, " +
          s"got ${value.dataType.simpleString}")
    else if ((baseCond +: events).exists(_.dataType != BooleanType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName condition arguments must be " +
          "boolean")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess
  }

  override def createAggregationBuffer()
      : ArrayBuffer[(Long, String, Int)] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, String, Int)],
      input: InternalRow): ArrayBuffer[(Long, String, Int)] = {
    val t = ts.eval(input)
    if (t != null) {
      val v = value.eval(input) match {
        case null          => null
        case s: UTF8String => s.toString
        case other         => other.toString
      }
      var mask = 0
      val bc = baseCond.eval(input)
      if (bc != null && bc.asInstanceOf[Boolean]) mask |= 1
      var i = 0
      while (i < events.length) {
        val c = events(i).eval(input)
        if (c != null && c.asInstanceOf[Boolean]) mask |= (1 << (i + 1))
        i += 1
      }
      buf += ((t.asInstanceOf[Long], v, mask))
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Long, String, Int)],
      b: ArrayBuffer[(Long, String, Int)])
      : ArrayBuffer[(Long, String, Int)] = { a ++= b; a }

  override def eval(buf: ArrayBuffer[(Long, String, Int)]): Any = {
    if (buf.isEmpty) return null
    val evs = buf.sortBy { case (t, v, _) =>
      (t, v == null, if (v == null) "" else v)
    }.toIndexedSeq
    val n = evs.size
    val d = if (forward) 1 else -1
    def bit(i: Int, b: Int): Boolean = ((evs(i)._3 >> b) & 1) == 1
    def anchorOk(i: Int): Boolean = bit(i, 0) && bit(i, 1)
    val anchor: Option[Int] = base match {
      case "head"        => Some(0).filter(_ => anchorOk(0))
      case "tail"        => Some(n - 1).filter(anchorOk)
      case "first_match" => evs.indices.find(anchorOk)
      case "last_match"  => evs.indices.findLast(anchorOk)
    }
    anchor.flatMap { b =>
      val chainOk = (2 to events.size).forall { i =>
        val at = b + (i - 1) * d
        at >= 0 && at < n && bit(at, i)
      }
      val nxt = b + events.size * d
      if (chainOk && nxt >= 0 && nxt < n) Option(evs(nxt)._2)
      else None
    } match {
      case Some(v) => UTF8String.fromString(v)
      case None    => null
    }
  }

  override def serialize(buf: ArrayBuffer[(Long, String, Int)])
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, v, m) =>
      out.writeLong(t)
      out.writeBoolean(v != null)
      if (v != null) out.writeUTF(v)
      out.writeInt(m)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : ArrayBuffer[(Long, String, Int)] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val sz = in.readInt()
    val buf = ArrayBuffer.empty[(Long, String, Int)]
    var i = 0
    while (i < sz) {
      val t = in.readLong()
      val v = if (in.readBoolean()) in.readUTF() else null
      buf += ((t, v, in.readInt()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): SequenceNextNode =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SequenceNextNode =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ts = newChildren(0), value = newChildren(1),
      baseCond = newChildren(2), events = newChildren.drop(3))
}
