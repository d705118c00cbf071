package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's `analysisOfVariance(value, group)` (alias `anova`) —
  * one-way ANOVA: between/within variance ratio over the per-group
  * moment triples, returning `(f_statistic, p_value)`.
  *
  *   SSB = Σ n_g·(m_g − m)²,  SSW = Σ (Σx² − n_g·m_g²),
  *   F = (SSB/(k−1)) / (SSW/(n−k)),
  *   p = P(F_{k−1, n−k} > F) = I_{d2/(d2+d1·F)}(d2/2, d1/2)
  *   (regularized incomplete beta, [[StatDist.fUpper]]).
  *
  * State is a group → (count, Σx, Σx²) map — O(distinct groups),
  * never O(rows) — merged by component sums, so partial aggregation
  * runs map-side (the CrossTabAgg scale shape). NULL value or group
  * rows skip. Degenerate inputs (< 2 groups, n ≤ k, zero within-group
  * variance) evaluate to (NaN, NaN), CH's own reading.
  */
case class AnovaAgg(value: Expression, group: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      mutable.Map[Any, (Long, Double, Double)]] {

  override def prettyName: String = "analysisOfVariance"
  override def children: Seq[Expression] = Seq(value, group)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("f_statistic", DoubleType, nullable = false),
    StructField("p_value", DoubleType, nullable = false)))

  private def numeric(dt: DataType) = dt match {
    case _: NumericType => true
    case _              => false
  }
  private def keyable(dt: DataType) = Set[DataType](LongType,
    IntegerType, ShortType, ByteType, BooleanType, StringType)(dt)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (numeric(value.dataType) && keyable(group.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("analysisOfVariance takes (numeric value, " +
        s"integral/string/boolean group), got " +
        s"${value.dataType.simpleString}, ${group.dataType.simpleString}")

  override def createAggregationBuffer()
      : mutable.Map[Any, (Long, Double, Double)] = mutable.Map.empty

  private def keyOf(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case i: Int        => i.toLong
    case s: Short      => s.toLong
    case b: Byte       => b.toLong
    case b: Boolean    => if (b) 1L else 0L
    case l: Long       => l
    case other         => other.toString
  }

  private def asDouble(v: Any): Double = v match {
    case d: Double                              => d
    case f: Float                               => f.toDouble
    case l: Long                                => l.toDouble
    case i: Int                                 => i.toDouble
    case s: Short                               => s.toDouble
    case b: Byte                                => b.toDouble
    case d: org.apache.spark.sql.types.Decimal  => d.toDouble
    case other => throw new IllegalStateException(
      s"analysisOfVariance: unexpected value $other")
  }

  override def update(buf: mutable.Map[Any, (Long, Double, Double)],
      input: InternalRow): mutable.Map[Any, (Long, Double, Double)] = {
    val v = value.eval(input)
    val g = group.eval(input)
    if (v != null && g != null) {
      val x = asDouble(v)
      val k = keyOf(g)
      val (n, s, s2) = buf.getOrElse(k, (0L, 0.0, 0.0))
      buf.update(k, (n + 1, s + x, s2 + x * x))
    }
    buf
  }

  override def merge(a: mutable.Map[Any, (Long, Double, Double)],
      b: mutable.Map[Any, (Long, Double, Double)])
      : mutable.Map[Any, (Long, Double, Double)] = {
    b.foreach { case (k, (n, s, s2)) =>
      val (an, as, as2) = a.getOrElse(k, (0L, 0.0, 0.0))
      a.update(k, (an + n, as + s, as2 + s2))
    }
    a
  }

  override def eval(buf: mutable.Map[Any, (Long, Double, Double)]): Any = {
    val k = buf.size
    val n = buf.values.map(_._1).sum
    if (k < 2 || n <= k)
      return InternalRow(Double.NaN, Double.NaN)
    val total = buf.values.map(_._2).sum
    val mean = total / n
    var ssb = 0.0
    var ssw = 0.0
    buf.values.foreach { case (ng, s, s2) =>
      val mg = s / ng
      ssb += ng * (mg - mean) * (mg - mean)
      ssw += s2 - ng * mg * mg
    }
    if (ssw <= 0.0) return InternalRow(Double.NaN, Double.NaN)
    val d1 = (k - 1).toDouble
    val d2 = (n - k).toDouble
    val fStat = (ssb / d1) / (ssw / d2)
    InternalRow(fStat, StatDist.fUpper(fStat, d1, d2))
  }

  private def isStr = group.dataType == StringType

  override def serialize(
      buf: mutable.Map[Any, (Long, Double, Double)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(isStr)
    out.writeInt(buf.size)
    buf.foreach { case (g, (n, s, s2)) =>
      if (isStr) out.writeUTF(g.asInstanceOf[String])
      else out.writeLong(g.asInstanceOf[Long])
      out.writeLong(n); out.writeDouble(s); out.writeDouble(s2)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.Map[Any, (Long, Double, Double)] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val str = in.readBoolean()
    val sz = in.readInt()
    val buf = mutable.Map.empty[Any, (Long, Double, Double)]
    var i = 0
    while (i < sz) {
      val g: Any = if (str) in.readUTF() else in.readLong()
      buf.update(g, (in.readLong(), in.readDouble(), in.readDouble()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): AnovaAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): AnovaAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), group = newChildren(1))
}
