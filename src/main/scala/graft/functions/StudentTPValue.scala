package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/** Two-sided p-value of Student's t distribution:
  * p = I_{df/(df+t²)}(df/2, 1/2), the regularized incomplete beta
  * function evaluated by Lentz's continued fraction (the standard
  * numerical-recipes formulation, ~1e-14 relative accuracy in a few
  * dozen iterations). Backs the CH `studentTTest`/`welchTTest`
  * spellings, whose second tuple element is this p-value.
  *
  * CodegenFallback is deliberate: the expression evaluates ONCE per
  * aggregated group (it post-processes t and df), so it is never in a
  * per-row hot path and the iterative loop has no business being
  * inlined into whole-stage codegen.
  */
case class StudentTPValue(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "student_t_pvalue"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"$prettyName takes (t: double, df: double), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override protected def nullSafeEval(t: Any, df: Any): Any = {
    val tv = t.asInstanceOf[Double]
    val dfv = df.asInstanceOf[Double]
    if (dfv <= 0 || tv.isNaN || dfv.isNaN) null
    else StudentTPValue.twoSided(tv, dfv)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StudentTPValue {
  /** ln Γ via the Lanczos approximation (g = 7, n = 9). */
  private val lanczos = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  def lnGamma(x0: Double): Double = {
    if (x0 < 0.5)
      math.log(math.Pi / math.sin(math.Pi * x0)) - lnGamma(1.0 - x0)
    else {
      val x = x0 - 1.0
      var a = lanczos(0)
      val t = x + 7.5
      var i = 1
      while (i < 9) { a += lanczos(i) / (x + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (x + 0.5) * math.log(t) - t +
        math.log(a)
    }
  }

  /** Regularized incomplete beta I_x(a, b) via Lentz's continued
    * fraction, with the symmetry flip for convergence. */
  def betaRegularized(a: Double, b: Double, x: Double): Double = {
    if (x <= 0) return 0.0
    if (x >= 1) return 1.0
    val front = math.exp(lnGamma(a + b) - lnGamma(a) - lnGamma(b) +
      a * math.log(x) + b * math.log(1 - x))
    if (x > (a + 1) / (a + b + 2))
      return 1.0 - betaRegularized(b, a, 1 - x)
    // Lentz: I_x(a,b) = front * cf / a
    val tiny = 1e-300
    var c = 1.0
    var d = 1.0 - (a + b) * x / (a + 1)
    if (math.abs(d) < tiny) d = tiny
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 200) {
      val m2 = 2 * m
      // even step
      var num = m * (b - m) * x / ((a + m2 - 1) * (a + m2))
      d = 1.0 + num * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + num / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      h *= d * c
      // odd step
      num = -(a + m) * (a + b + m) * x / ((a + m2) * (a + m2 + 1))
      d = 1.0 + num * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + num / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-14) return front * h / a
      m += 1
    }
    front * h / a
  }

  /** Two-sided p for |t| with `df` degrees of freedom. */
  def twoSided(t: Double, df: Double): Double =
    betaRegularized(df / 2.0, 0.5, df / (df + t * t))
}
