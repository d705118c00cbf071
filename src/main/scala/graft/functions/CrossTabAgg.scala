package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's categorical-association family over one shared
  * cross-tabulation state — `cramersV(x, y)`,
  * `cramersVBiasCorrected(x, y)`, `contingency(x, y)`,
  * `theilsU(x, y)` (entropy-based, asymmetric — see the eval case):
  *
  *   chi² = Σ_cells (o−e)²/e  with  e_xy = rowCount_x · colCount_y / n,
  *   computed by the closed form chi² = Σ_observed o²/e − n (the
  *   unobserved cells' Σe contribution folds in analytically, so the
  *   state never enumerates the full r×c grid);
  *   contingency = √(chi² / (chi² + n));
  *   cramersV    = √(chi² / (n · min(r−1, c−1)));
  *   cramersVBiasCorrected = Bergsma's correction:
  *     φ²₊ = max(0, chi²/n − (r−1)(c−1)/(n−1)),
  *     r₊ = r − (r−1)²/(n−1),  c₊ = c − (c−1)²/(n−1),
  *     V = √(φ²₊ / min(r₊−1, c₊−1)).
  *
  * State is a (x, y) pair → count map — O(distinct pairs), never
  * O(rows) — merged by summing counts, so partial aggregation runs
  * map-side (the sumMap/entropy scale shape). Rows with a NULL on
  * either side skip. A degenerate table (constant column, < 2 rows)
  * evaluates to 0.0: no variation, no measurable association.
  * Input types are restricted like [[EntropyAgg]] — categorical
  * association over continuous doubles is a float-equality trap.
  */
case class CrossTabAgg(x: Expression, y: Expression, kind: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.Map[(Any, Any), Long]] {

  require(CrossTabAgg.Kinds.contains(kind),
    s"unknown cross-tab kind $kind")

  override def prettyName: String = kind
  override def children: Seq[Expression] = Seq(x, y)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  private def keyable(dt: DataType) = Set[DataType](LongType, IntegerType,
    ShortType, ByteType, BooleanType, DateType, StringType)(dt)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (keyable(x.dataType) && keyable(y.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$kind takes integral/string/boolean/date " +
        s"columns, got ${x.dataType.simpleString}, " +
        s"${y.dataType.simpleString} (bucket continuous values first)")

  override def createAggregationBuffer(): mutable.Map[(Any, Any), Long] =
    mutable.Map.empty

  private def keyOf(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case i: Int        => i.toLong
    case s: Short      => s.toLong
    case b: Byte       => b.toLong
    case b: Boolean    => if (b) 1L else 0L
    case l: Long       => l
    case other         => other.toString
  }

  override def update(buf: mutable.Map[(Any, Any), Long],
      input: InternalRow): mutable.Map[(Any, Any), Long] = {
    val xv = x.eval(input)
    val yv = y.eval(input)
    if (xv != null && yv != null) {
      val k = (keyOf(xv), keyOf(yv))
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(a: mutable.Map[(Any, Any), Long],
      b: mutable.Map[(Any, Any), Long]): mutable.Map[(Any, Any), Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    a
  }

  override def eval(buf: mutable.Map[(Any, Any), Long]): Any = {
    if (buf.isEmpty) return 0.0
    val rowCnt = mutable.Map.empty[Any, Long]
    val colCnt = mutable.Map.empty[Any, Long]
    var n = 0L
    buf.foreach { case ((a, b), c) =>
      rowCnt.update(a, rowCnt.getOrElse(a, 0L) + c)
      colCnt.update(b, colCnt.getOrElse(b, 0L) + c)
      n += c
    }
    val r = rowCnt.size.toDouble
    val c = colCnt.size.toDouble
    if (n < 2 || r < 2 || c < 2) return 0.0
    val nd = n.toDouble
    if (kind == "infoValue") {
      // categoricalInformationValue(category, tag) — weight-of-
      // evidence information value of the FIRST column against the
      // binary tag in the second: IV = Σ_cat (g/G − b/B)·ln((g/G)/
      // (b/B)) with g = tag≠0 count, b = tag=0 count in the category.
      // Zero cells contribute nothing (the ±∞ WoE convention is
      // capped out, documented deviation from CH's raw ln).
      def isZero(v: Any): Boolean = v match {
        case l: Long   => l == 0L
        case s: String => s == "0" || s.isEmpty
        case other     => other == null
      }
      val goods = colCnt.filterNot { case (k, _) => isZero(k) }
        .values.sum.toDouble
      val bads = colCnt.filter { case (k, _) => isZero(k) }
        .values.sum.toDouble
      if (goods == 0.0 || bads == 0.0) return 0.0
      var iv = 0.0
      rowCnt.keys.foreach { cat =>
        var g = 0L
        var b = 0L
        buf.foreach { case ((a, t), cnt) if a == cat =>
          if (isZero(t)) b += cnt else g += cnt
        case _ => ()
        }
        if (g > 0 && b > 0) {
          val pg = g / goods
          val pb = b / bads
          iv += (pg - pb) * math.log(pg / pb)
        }
      }
      return iv
    }
    if (kind == "theilsU") {
      // Theil's uncertainty coefficient U(x|y) — how much knowing y
      // reduces the entropy of x, normalized: (H(x) − H(x|y)) / H(x),
      // with H(x|y) = −Σ p(x,y)·ln(p(x,y)/p(y)). Asymmetric by
      // definition; the FIRST argument is the predicted column.
      var hx = 0.0
      rowCnt.values.foreach { cnt =>
        val p = cnt.toDouble / nd
        hx -= p * math.log(p)
      }
      if (hx == 0.0) return 0.0
      var hxy = 0.0
      buf.foreach { case ((_, b), o) =>
        val pab = o.toDouble / nd
        val pb = colCnt(b).toDouble / nd
        hxy -= pab * math.log(pab / pb)
      }
      return (hx - hxy) / hx
    }
    // chi² = Σ o²/e − n  (e over observed cells; unobserved fold in)
    var sumO2E = 0.0
    buf.foreach { case ((a, b), o) =>
      val e = rowCnt(a).toDouble * colCnt(b).toDouble / nd
      sumO2E += o.toDouble * o.toDouble / e
    }
    val chi2 = math.max(0.0, sumO2E - nd)
    kind match {
      case "contingency" => math.sqrt(chi2 / (chi2 + nd))
      case "cramersV" => math.sqrt(chi2 / (nd * math.min(r - 1, c - 1)))
      case "cramersVBiasCorrected" =>
        val phi2 = chi2 / nd
        val phi2c =
          math.max(0.0, phi2 - (r - 1) * (c - 1) / (nd - 1))
        val rc = r - (r - 1) * (r - 1) / (nd - 1)
        val cc = c - (c - 1) * (c - 1) / (nd - 1)
        val denom = math.min(rc, cc) - 1
        if (denom <= 0) 0.0 else math.sqrt(phi2c / denom)
    }
  }

  private def isStr(e: Expression) = e.dataType == StringType

  override def serialize(buf: mutable.Map[(Any, Any), Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(isStr(x))
    out.writeBoolean(isStr(y))
    out.writeInt(buf.size)
    def w(str: Boolean, v: Any): Unit =
      if (str) out.writeUTF(v.asInstanceOf[String])
      else out.writeLong(v.asInstanceOf[Long])
    buf.foreach { case ((a, b), cnt) =>
      w(isStr(x), a); w(isStr(y), b); out.writeLong(cnt)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.Map[(Any, Any), Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val xs = in.readBoolean()
    val ys = in.readBoolean()
    val sz = in.readInt()
    def r(str: Boolean): Any = if (str) in.readUTF() else in.readLong()
    val buf = mutable.Map.empty[(Any, Any), Long]
    var i = 0
    while (i < sz) {
      buf.update((r(xs), r(ys)), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CrossTabAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CrossTabAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(x = newChildren(0), y = newChildren(1))
}

object CrossTabAgg {
  val Kinds: Set[String] =
    Set("cramersV", "cramersVBiasCorrected", "contingency", "theilsU",
      "infoValue")
}
