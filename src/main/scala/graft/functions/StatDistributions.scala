package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Gaussian and Kolmogorov distribution tails backing the CH
  * nonparametric-test spellings (`mannWhitneyUTest`,
  * `kolmogorovSmirnovTest`, `meanZTest` — reference dashboards lean on
  * these for release A/B comparisons the way they lean on
  * `studentTTest`, pkg-level README.md:180-184 query style).
  *
  * erfc comes from the regularized upper incomplete gamma
  * Q(1/2, x²) — series below a+1, Lentz's continued fraction above —
  * the standard numerical-recipes split, ~1e-14 relative. The inverse
  * normal CDF is Acklam's rational approximation polished with one
  * Halley step against this erfc (~1e-15), evaluated only at
  * TRANSLATION time on literal confidence levels, never per row.
  */
object StatDist {

  /** Regularized upper incomplete gamma Q(a, x) = Γ(a, x)/Γ(a). */
  def gammaQ(a: Double, x: Double): Double = {
    if (a <= 0 || x < 0 || a.isNaN || x.isNaN) Double.NaN
    else if (x == 0) 1.0
    else if (x < a + 1.0) 1.0 - gser(a, x)
    else gcf(a, x)
  }

  /** P(a, x) by the power series (converges fast for x < a+1). */
  private def gser(a: Double, x: Double): Double = {
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var n = 0
    while (n < 500) {
      ap += 1.0
      del *= x / ap
      sum += del
      if (math.abs(del) < math.abs(sum) * 1e-15) n = 500 else n += 1
    }
    sum * math.exp(-x + a * math.log(x) - StudentTPValue.lnGamma(a))
  }

  /** Q(a, x) by Lentz's continued fraction (x >= a+1). */
  private def gcf(a: Double, x: Double): Double = {
    val tiny = 1e-300
    var b = x + 1.0 - a
    var c = 1.0 / tiny
    var d = 1.0 / b
    var h = d
    var i = 1
    while (i <= 500) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b
      if (math.abs(d) < tiny) d = tiny
      c = b + an / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-15) i = 501 else i += 1
    }
    math.exp(-x + a * math.log(x) - StudentTPValue.lnGamma(a)) * h
  }

  def erfc(x: Double): Double =
    if (x.isNaN) Double.NaN
    else if (x < 0) 2.0 - erfc(-x)
    else gammaQ(0.5, x * x)

  /** P(Z > z) for a standard normal. */
  def normUpper(z: Double): Double = 0.5 * erfc(z / math.sqrt(2.0))

  // Acklam's inverse-normal coefficients (the widely published
  // public-domain set; |relative error| < 1.15e-9 before refinement).
  private val ia = Array(-3.969683028665376e+01, 2.209460984245205e+02,
    -2.759285104469687e+02, 1.383577518672690e+02,
    -3.066479806614716e+01, 2.506628277459239e+00)
  private val ib = Array(-5.447609879822406e+01, 1.615858368580409e+02,
    -1.556989798598866e+02, 6.680131188771972e+01,
    -1.328068155288572e+01)
  private val ic = Array(-7.784894002430293e-03, -3.223964580411365e-01,
    -2.400758277161838e+00, -2.549732539343734e+00,
    4.374664141464968e+00, 2.938163982698783e+00)
  private val id = Array(7.784695709041462e-03, 3.224671290700398e-01,
    2.445134137142996e+00, 3.754408661907416e+00)

  /** Inverse standard-normal CDF (quantile function). */
  def invNormCdf(p: Double): Double = {
    require(p > 0.0 && p < 1.0, s"normal quantile needs 0 < p < 1, got $p")
    val pLow = 0.02425
    val x0 =
      if (p < pLow) {
        val q = math.sqrt(-2.0 * math.log(p))
        (((((ic(0) * q + ic(1)) * q + ic(2)) * q + ic(3)) * q + ic(4)) *
          q + ic(5)) /
          ((((id(0) * q + id(1)) * q + id(2)) * q + id(3)) * q + 1.0)
      } else if (p <= 1.0 - pLow) {
        val q = p - 0.5
        val r = q * q
        (((((ia(0) * r + ia(1)) * r + ia(2)) * r + ia(3)) * r + ia(4)) *
          r + ia(5)) * q /
          (((((ib(0) * r + ib(1)) * r + ib(2)) * r + ib(3)) * r +
            ib(4)) * r + 1.0)
      } else {
        val q = math.sqrt(-2.0 * math.log(1.0 - p))
        -(((((ic(0) * q + ic(1)) * q + ic(2)) * q + ic(3)) * q + ic(4)) *
          q + ic(5)) /
          ((((id(0) * q + id(1)) * q + id(2)) * q + id(3)) * q + 1.0)
      }
    // one Halley refinement against the high-precision erfc
    val e = 0.5 * erfc(-x0 / math.sqrt(2.0)) - p
    val u = e * math.sqrt(2.0 * math.Pi) * math.exp(x0 * x0 / 2.0)
    x0 - u / (1.0 + x0 * u / 2.0)
  }

  /** Kolmogorov distribution survival Q(λ) = P(K > λ): the classic
    * two-branch evaluation — the (1 − theta-series) form below
    * λ = 1.18 where the alternating series converges slowly, the
    * alternating series 2Σ(−1)^{k−1}e^{−2k²λ²} above it. */
  def ksQ(lambda: Double): Double = {
    if (lambda.isNaN) return Double.NaN
    if (lambda <= 0.0) return 1.0
    val q =
      if (lambda < 1.18) {
        val t = math.exp(-math.Pi * math.Pi / (8.0 * lambda * lambda))
        1.0 - math.sqrt(2.0 * math.Pi) / lambda *
          (t + math.pow(t, 9.0) + math.pow(t, 25.0) + math.pow(t, 49.0))
      } else {
        val t = math.exp(-2.0 * lambda * lambda)
        2.0 * (t - math.pow(t, 4.0) + math.pow(t, 9.0) -
          math.pow(t, 16.0))
      }
    math.min(1.0, math.max(0.0, q))
  }

  /** Regularized incomplete beta I_x(a, b) — Lentz continued fraction
    * with the symmetry switch at x = (a+1)/(a+b+2), the same
    * numerical-recipes-style construction as gammaQ above. Backs the
    * F-distribution tail of `analysisOfVariance`:
    * P(F > f; d1, d2) = I_{d2/(d2 + d1 f)}(d2/2, d1/2). */
  def betaI(a: Double, b: Double, x: Double): Double = {
    if (a.isNaN || b.isNaN || x.isNaN || x < 0 || x > 1) return Double.NaN
    if (x == 0.0) return 0.0
    if (x == 1.0) return 1.0
    val lbeta = StudentTPValue.lnGamma(a + b) -
      StudentTPValue.lnGamma(a) - StudentTPValue.lnGamma(b)
    val front = math.exp(lbeta + a * math.log(x) +
      b * math.log(1.0 - x))
    if (x < (a + 1.0) / (a + b + 2.0)) front * betacf(a, b, x) / a
    else 1.0 - math.exp(lbeta + b * math.log(1.0 - x) +
      a * math.log(x)) * betacf(b, a, 1.0 - x) / b
  }

  private def betacf(a: Double, b: Double, x: Double): Double = {
    val tiny = 1e-300
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < tiny) d = tiny
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + aa / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + aa / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-15) m = 301 else m += 1
    }
    h
  }

  /** F-distribution survival P(F > f) for (d1, d2) degrees of freedom. */
  def fUpper(f: Double, d1: Double, d2: Double): Double =
    if (f.isNaN || f < 0 || d1 <= 0 || d2 <= 0) Double.NaN
    else betaI(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))
}

/** P(Z > z) — emitted by the Mann–Whitney rewriter and the `meanZTest`
  * builder. CodegenFallback like [[StudentTPValue]]: evaluated once per
  * aggregated group, never in a per-row hot path. */
case class NormUpperTail(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "norm_upper_tail"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes a double, got " +
        child.dataType.simpleString)
  override protected def nullSafeEval(z: Any): Any = {
    val zv = z.asInstanceOf[Double]
    if (zv.isNaN) null else StatDist.normUpper(zv)
  }
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Kolmogorov survival Q(λ) — emitted by the two-sample KS rewriter. */
case class KolmogorovQ(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "kolmogorov_q"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes a double, got " +
        child.dataType.simpleString)
  override protected def nullSafeEval(l: Any): Any = {
    val lv = l.asInstanceOf[Double]
    if (lv.isNaN) null else StatDist.ksQ(lv)
  }
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
