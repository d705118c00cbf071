package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StructField,
  StructType}

/** CH's A/B-test sizing scalars as one expression:
  *
  *  - `minSampleSizeContinous(baseline, sigma, mde, power, alpha)`
  *    (CH's spelling; the corrected `...Continuous` is an alias) —
  *    the two-sample means form:
  *      n = 2·(z_{1−α/2} + z_{power})²·σ² / (mde·baseline)²
  *    with mde a FRACTION of baseline, detect range
  *    baseline·(1 ∓ mde);
  *  - `minSampleSizeConversion(p1, mde, power, alpha)` — the
  *    two-proportion form with pooled null variance:
  *      n = (z_{1−α/2}·√(2p̄(1−p̄)) + z_{power}·√(p₁q₁ + p₂q₂))² / mde²
  *    with mde the ABSOLUTE rate difference (p₂ = p₁ + mde), detect
  *    range p₁ ∓ mde.
  *
  * Both are the standard textbook power-analysis closed forms (the
  * same z-based sizing every calculator publishes); the result is the
  * per-group size as a plain double tuple
  * (minimum_sample_size, detect_range_lower, detect_range_upper), no
  * ceiling applied — CH returns the fractional size too. Arguments
  * may be columns; the normal quantiles are evaluated per row through
  * [[StatDist.invNormCdf]] (CodegenFallback — sizing calls are
  * dashboard-shaped, never a 100 TB hot path).
  */
case class MinSampleSize(continuous: Boolean, children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def prettyName: String =
    if (continuous) "minSampleSizeContinous" else "minSampleSizeConversion"
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType = StructType(Seq(
    StructField("minimum_sample_size", DoubleType, nullable = false),
    StructField("detect_range_lower", DoubleType, nullable = false),
    StructField("detect_range_upper", DoubleType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val want = if (continuous) 5 else 4
    if (children.size != want)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName takes $want arguments, got " +
          children.size)
    else if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes doubles, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val d = vs.map(_.asInstanceOf[Double])
    if (continuous) {
      val (baseline, sigma, mde, power, alpha) =
        (d(0), d(1), d(2), d(3), d(4))
      if (mde <= 0 || power <= 0 || power >= 1 || alpha <= 0 ||
        alpha >= 1) return null
      val z = StatDist.invNormCdf(1.0 - alpha / 2.0) +
        StatDist.invNormCdf(power)
      val n = 2.0 * z * z * sigma * sigma /
        math.pow(mde * baseline, 2)
      InternalRow(n, baseline * (1.0 - mde), baseline * (1.0 + mde))
    } else {
      val (p1, mde, power, alpha) = (d(0), d(1), d(2), d(3))
      if (mde == 0 || power <= 0 || power >= 1 || alpha <= 0 ||
        alpha >= 1) return null
      val p2 = p1 + mde
      val pbar = (p1 + p2) / 2.0
      val za = StatDist.invNormCdf(1.0 - alpha / 2.0)
      val zb = StatDist.invNormCdf(power)
      val s = za * math.sqrt(2.0 * pbar * (1.0 - pbar)) +
        zb * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
      InternalRow(s * s / (mde * mde), p1 - mde, p1 + mde)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
