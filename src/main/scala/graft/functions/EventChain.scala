package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType,
  LongType, TimestampNTZType, TimestampType}

/** Ordered-event-chain aggregates — the engine's ClickHouse
  * `windowFunnel` / `sequenceMatch` (kubenetmon's ClickHouse exposes
  * both to its dashboard users; reference DDL consumers run them over
  * exactly this kind of event table). One buffer shape serves both: a
  * bag of `(timestamp_micros, condition_bitmask)` pairs, concatenated
  * at merge (partial aggregation works like any CH `-State`), sorted
  * once at eval.
  *
  * [[WindowFunnel]] replays ClickHouse's chain algorithm
  * (AggregateFunctionWindowFunnel.h, default mode): scanning events in
  * time order, a level-1 event always (re)opens a chain, and a
  * level-k event extends a chain whose START is within `window`
  * SECONDS — the chain-start timestamp propagates, so the window is
  * measured from the first step, not the previous one. Returns the
  * deepest level reached. Ties in the sort break by level ascending
  * (CH sorts its (t, idx) pairs the same way).
  *
  * [[SequenceMatchChain]] is the `(?1)(?2)...` subset of CH's
  * sequenceMatch patterns — subsequence existence in time order,
  * evaluated by a greedy scan (greedy is complete for subsequence
  * matching). Time-bound pattern atoms (`(?t<=...)`) are refused at
  * registration, not silently approximated.
  */
abstract class EventChainAgg extends TypedImperativeAggregate[ArrayBuffer[(Long, Int)]] {

  /** timestamp child + condition children (bit i of the mask). */
  def ts: Expression
  def conds: Seq[Expression]

  override def children: Seq[Expression] = ts +: conds
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = ts.dataType == TimestampType ||
      ts.dataType == TimestampNTZType || ts.dataType == LongType
    if (!ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a timestamp (or epoch-micros long) first " +
          s"argument, got ${ts.dataType.simpleString}")
    else if (conds.exists(_.dataType != BooleanType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName condition arguments must be boolean")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Int)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Long, Int)],
      input: InternalRow): ArrayBuffer[(Long, Int)] = {
    val t = ts.eval(input)
    if (t != null) {
      var mask = 0
      var i = 0
      while (i < conds.length) {
        val c = conds(i).eval(input)
        if (c != null && c.asInstanceOf[Boolean]) mask |= (1 << i)
        i += 1
      }
      // events matching no step never influence the default-mode
      // algorithms — dropping them bounds the buffer by matching
      // events, not group size
      if (mask != 0) buf += ((t.asInstanceOf[Long], mask))
    }
    buf
  }

  override def merge(a: ArrayBuffer[(Long, Int)],
      b: ArrayBuffer[(Long, Int)]): ArrayBuffer[(Long, Int)] = { a ++= b; a }

  override def serialize(buf: ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 12)
    bb.putInt(buf.length)
    buf.foreach { case (t, m) => bb.putLong(t); bb.putInt(m) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Int)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Int)](n)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getInt)); i += 1 }
    buf
  }

  /** Sorted (t, per-event level list ascending) stream — one entry per
    * (event, matched level), CH's iteration order.
    */
  protected def sortedLevels(
      buf: ArrayBuffer[(Long, Int)]): Iterator[(Long, Int)] = {
    val sorted = buf.sortBy(_._1)
    sorted.iterator.flatMap { case (t, mask) =>
      Iterator.range(0, conds.length).collect {
        case i if (mask & (1 << i)) != 0 => (t, i)
      }
    }
  }
}

case class WindowFunnel(windowSeconds: Long, ts: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends EventChainAgg {

  override def prettyName: String = "windowFunnel"
  override def dataType: DataType = IntegerType

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any = {
    val window = windowSeconds * 1000000L // micros; CH DateTime = seconds
    // chainStart(k) = start timestamp of a live chain whose last step
    // is level k (0-based); level-0 events always (re)open a chain
    val chainStart = Array.fill[Long](conds.length)(Long.MinValue)
    val live = Array.fill[Boolean](conds.length)(false)
    var best = 0
    sortedLevels(buf).foreach { case (t, lvl) =>
      if (lvl == 0) {
        chainStart(0) = t; live(0) = true
        if (best < 1) best = 1
      } else if (live(lvl - 1) && t <= chainStart(lvl - 1) + window) {
        chainStart(lvl) = chainStart(lvl - 1); live(lvl) = true
        if (best < lvl + 1) best = lvl + 1
      }
    }
    best
  }

  override def withNewMutableAggBufferOffset(o: Int): WindowFunnel =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WindowFunnel =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WindowFunnel =
    copy(ts = newChildren.head, conds = newChildren.tail)
}

/** `sequenceCount('(?1)(?2)...')`: how many NON-OVERLAPPING
  * time-ordered occurrences of the chain does the group contain?
  * Greedy restart after each completion — ClickHouse's contract.
  */
case class SequenceCountChain(chain: Seq[Int], ts: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends EventChainAgg {

  override def prettyName: String = "sequenceCount"
  override def dataType: DataType = LongType

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any = {
    var pos = 0
    var n = 0L
    sortedLevels(buf).foreach { case (_, lvl) =>
      if (lvl == chain(pos)) {
        pos += 1
        if (pos == chain.length) { n += 1; pos = 0 }
      }
    }
    n
  }

  override def withNewMutableAggBufferOffset(o: Int): SequenceCountChain =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SequenceCountChain =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SequenceCountChain =
    copy(ts = newChildren.head, conds = newChildren.tail)
}

/** `sequenceMatch('(?1)(?2)...')`: does the group's event stream
  * contain the numbered conditions as a time-ordered subsequence?
  * `chain` holds the 0-based condition indices in pattern order.
  */
case class SequenceMatchChain(chain: Seq[Int], ts: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends EventChainAgg {

  override def prettyName: String = "sequenceMatch"
  override def dataType: DataType = BooleanType

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any = {
    var pos = 0
    val it = sortedLevels(buf)
    while (pos < chain.length && it.hasNext) {
      val (_, lvl) = it.next()
      if (lvl == chain(pos)) pos += 1
    }
    pos == chain.length
  }

  override def withNewMutableAggBufferOffset(o: Int): SequenceMatchChain =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SequenceMatchChain =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SequenceMatchChain =
    copy(ts = newChildren.head, conds = newChildren.tail)
}
