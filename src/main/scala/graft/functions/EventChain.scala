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
  * [[SequenceMatchChain]] implements CH's sequenceMatch pattern
  * language over `(?N)` atoms, `.*` gaps, and `(?t OP n)` time bounds
  * with a backtracking matcher (CH's own matcher backtracks too:
  * AggregateFunctionSequenceMatch.h). CH semantics preserved
  * faithfully: events matching NO condition are ignored; adjacent
  * `(?N)(?M)` atoms must match DIRECTLY consecutive events among the
  * condition-matching ones (gaps require an explicit `.*`); a time
  * bound compares the atom's event against the previously matched
  * atom's event in seconds AND allows arbitrary events between (the
  * documented `(?1)(?t>1800)(?2)` contract); the match is unanchored
  * (leading/trailing events never matter).
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

  /** Time-sorted whole events — one element per event, carrying its
    * full condition bitmask (the sequenceMatch matcher consumes one
    * EVENT per atom; same-timestamp ties break by mask for a stable
    * distributed answer where CH leaves them unspecified).
    */
  protected def sortedEvents(
      buf: ArrayBuffer[(Long, Int)]): IndexedSeq[(Long, Int)] =
    buf.sortBy(identity).toIndexedSeq
}

/** One `(?N)` atom of a compiled sequenceMatch/sequenceCount pattern:
  * 0-based condition index, whether a gap (`.*` or any time bound)
  * precedes it, and the time bounds `(op, micros)` evaluated against
  * the previously matched atom's event timestamp.
  */
case class SeqAtom(cond: Int, gapBefore: Boolean, tcs: Seq[(String, Long)])

object EventChainPattern {

  private val token =
    raw"\(\?(\d+)\)|\.\*|\(\?t\s*(<=|>=|==|<|>)\s*(\d+)\)".r

  /** Compile a CH sequenceMatch pattern into [[SeqAtom]]s. Supported
    * grammar: `(?N)` condition atoms, `.*` gaps, `(?t OP seconds)`
    * time bounds (OP in <=, <, >=, >, ==) between two atoms. Anything
    * else — including the single-event wildcard `.`, which would need
    * non-matching events the buffer deliberately drops — is refused
    * with a named error, never silently approximated.
    */
  def parse(pattern: String, nConds: Int, fname: String): Seq[SeqAtom] = {
    val ms = token.findAllMatchIn(pattern).toSeq
    require(ms.map(_.matched).mkString == pattern.replace(" ", ""),
      s"unsupported $fname pattern `$pattern`: only (?N) atoms, .* gaps " +
        "and (?t<=n)-style time bounds are supported")
    val atoms = ArrayBuffer.empty[SeqAtom]
    var gap = false
    var tcs = Vector.empty[(String, Long)]
    ms.foreach { m =>
      if (m.group(1) != null) {
        val n = m.group(1).toInt
        require(n >= 1 && n <= nConds,
          s"$fname pattern `$pattern` references condition $n but the " +
            s"call passes $nConds")
        atoms += SeqAtom(n - 1, gapBefore = gap, tcs = tcs)
        gap = false; tcs = Vector.empty
      } else if (m.matched == ".*") gap = true
      else { // (?t OP v): implies a gap (CH: arbitrary events between)
        tcs :+= ((m.group(2), m.group(3).toLong * 1000000L))
        gap = true
      }
    }
    require(atoms.nonEmpty, s"$fname pattern `$pattern` has no (?N) atom")
    require(atoms.head.tcs.isEmpty,
      s"$fname pattern `$pattern`: a time bound needs a preceding atom")
    require(tcs.isEmpty,
      s"$fname pattern `$pattern`: a time bound needs a following atom")
    atoms.toSeq
  }

  private def holds(op: String, dt: Long, bound: Long): Boolean = op match {
    case "<=" => dt <= bound
    case "<"  => dt < bound
    case ">=" => dt >= bound
    case ">"  => dt > bound
    case _    => dt == bound
  }

  /** Backtracking matcher (CH's own sequenceMatch matcher backtracks).
    * Returns the index ONE PAST the last consumed event of the first
    * match found scanning left-to-right, or -1 — sequenceCount resumes
    * from that index for the non-overlapping contract. `from` is the
    * first event the match may use; the match itself is unanchored
    * (atom 0 scans forward freely).
    */
  def findMatch(evs: IndexedSeq[(Long, Int)], atoms: Seq[SeqAtom],
      from: Int): Int = {
    def go(ei: Int, ai: Int, prevT: Long): Int = {
      if (ai == atoms.length) return ei
      val a = atoms(ai)
      def ok(i: Int): Boolean = {
        val (t, mask) = evs(i)
        ((mask >> a.cond) & 1) == 1 &&
          a.tcs.forall { case (op, b) => holds(op, t - prevT, b) }
      }
      if (a.gapBefore || ai == 0) {
        var i = ei
        while (i < evs.length) {
          if (ok(i)) {
            val r = go(i + 1, ai + 1, evs(i)._1)
            if (r >= 0) return r
          }
          i += 1
        }
        -1
      } else if (ei < evs.length && ok(ei)) go(ei + 1, ai + 1, evs(ei)._1)
      else -1
    }
    go(from, 0, 0L)
  }
}

case class WindowFunnel(windowSeconds: Long, ts: Expression,
    conds: Seq[Expression], modes: Set[String] = Set.empty,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends EventChainAgg {

  require(modes.subsetOf(WindowFunnel.Modes),
    s"windowFunnel modes must be among ${WindowFunnel.Modes}, " +
      s"got $modes")

  override def prettyName: String = "windowFunnel"
  override def dataType: DataType = IntegerType

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any = {
    val window = windowSeconds * 1000000L // micros; CH DateTime = seconds
    if (modes.isEmpty) evalDefault(buf, window)
    else evalModes(buf, window)
  }

  private def evalDefault(buf: ArrayBuffer[(Long, Int)],
      window: Long): Int = {
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

  /** The mode-extended walk, per-EVENT (modes need the full condition
    * mask). Documented contracts (ts order, ties by mask):
    *  - strict_increase: step k+1 must be strictly LATER than the
    *    chain's step k (same-timestamp events cannot chain);
    *  - strict_dedup: an event re-matching a live chain's CURRENT
    *    last-step condition closes that chain, and may not itself
    *    extend into or reopen that level;
    *  - strict_order: an event matching ANY funnel condition closes
    *    every live chain it did not itself open or extend.
    */
  private def evalModes(buf: ArrayBuffer[(Long, Int)],
      window: Long): Int = {
    val inc = modes("strict_increase")
    val dedup = modes("strict_dedup")
    val order = modes("strict_order")
    val n = conds.length
    val chainStart = Array.fill[Long](n)(Long.MinValue)
    val lastT = Array.fill[Long](n)(Long.MinValue)
    val live = Array.fill[Boolean](n)(false)
    var best = 0
    sortedEvents(buf).foreach { case (t, mask) =>
      def bit(k: Int): Boolean = ((mask >> k) & 1) != 0
      // strict_dedup FIRST: an event re-matching a live chain's
      // current last step closes that chain and may not itself
      // extend into (or reopen) that level
      var dupMask = 0
      if (dedup) {
        var j = 0
        while (j < n) {
          if (bit(j) && live(j)) { live(j) = false; dupMask |= 1 << j }
          j += 1
        }
      }
      // extend top-down so one event cannot chain through itself
      var k = n - 2
      while (k >= 0) {
        if (live(k) && bit(k + 1) && ((dupMask >> (k + 1)) & 1) == 0 &&
          t <= chainStart(k) + window &&
          (!inc || t > lastT(k))) {
          chainStart(k + 1) = chainStart(k)
          lastT(k + 1) = t
          live(k + 1) = true
          if (best < k + 2) best = k + 2
        }
        k -= 1
      }
      if (bit(0) && (dupMask & 1) == 0) {
        chainStart(0) = t; lastT(0) = t; live(0) = true
        if (best < 1) best = 1
      }
      if (order && mask != 0) {
        var j = 0
        while (j < n) {
          if (live(j) && lastT(j) != t) live(j) = false
          j += 1
        }
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

object WindowFunnel {
  val Modes: Set[String] =
    Set("strict_order", "strict_dedup", "strict_increase")
}

/** `sequenceCount('pattern')`: how many NON-OVERLAPPING time-ordered
  * occurrences of the pattern does the group contain? Greedy restart
  * after each completed match — ClickHouse's contract. Full pattern
  * language via [[EventChainPattern]] (adjacency, `.*`, time bounds).
  */
case class SequenceCountChain(atoms: Seq[SeqAtom], ts: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends EventChainAgg {

  override def prettyName: String = "sequenceCount"
  override def dataType: DataType = LongType

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any = {
    val evs = sortedEvents(buf)
    var pos = 0
    var n = 0L
    while (pos < evs.length) {
      val end = EventChainPattern.findMatch(evs, atoms, pos)
      if (end < 0) pos = evs.length
      else { n += 1; pos = end }
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

/** `sequenceMatch('pattern')`: does the group's time-ordered event
  * stream contain a chain matching the pattern? Full CH pattern
  * language via [[EventChainPattern]]: adjacent atoms must match
  * directly consecutive condition-matching events, `.*` allows gaps,
  * `(?t OP n)` bounds the seconds between neighboring matched atoms.
  */
case class SequenceMatchChain(atoms: Seq[SeqAtom], ts: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends EventChainAgg {

  override def prettyName: String = "sequenceMatch"
  override def dataType: DataType = BooleanType

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any =
    EventChainPattern.findMatch(sortedEvents(buf), atoms, 0) >= 0

  override def withNewMutableAggBufferOffset(o: Int): SequenceMatchChain =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SequenceMatchChain =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SequenceMatchChain =
    copy(ts = newChildren.head, conds = newChildren.tail)
}
