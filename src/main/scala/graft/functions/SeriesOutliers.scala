package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** CH `seriesOutliersDetectTukey(series[, min_pct, max_pct, k])` —
  * Tukey-fence anomaly scores over a numeric series held as an array
  * (the monitoring shape: one row per metric, the window's samples in
  * an array column):
  *
  *   lo = Q(min_pct) − k·IQR,  hi = Q(max_pct) + k·IQR,
  *   score_i = 0 inside [lo, hi]; (v_i − lo) below (negative);
  *             (v_i − hi) above (positive)
  *
  * so the score carries both the direction and the distance past the
  * fence. Quantiles are linear-interpolated over the sorted series
  * (the Percentile / quantile_cont convention, so an engine replay
  * agrees bit-for-bit after rounding). Defaults: percentiles 25/75,
  * k = 1.5 — Tukey's. Per-row cost is O(n log n) in the array length;
  * the expression is CodegenFallback because the sort dominates
  * anyway. NULL array or fewer than 4 samples yields NULL (no
  * meaningful quartiles), NULL elements are rejected loudly.
  */
case class SeriesOutliersTukey(child: Expression, minPct: Double,
    maxPct: Double, k: Double)
    extends UnaryExpression with CodegenFallback {

  require(minPct >= 0 && maxPct <= 1 && minPct < maxPct,
    s"percentiles must satisfy 0 <= min < max <= 1, got $minPct, $maxPct")
  require(k >= 0, s"k must be >= 0, got $k")

  override def prettyName: String = "seriesOutliersDetectTukey"
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case dt               => dt
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: NumericType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName takes a numeric array, got " +
            other.simpleString)
    }

  private def quantile(sorted: Array[Double], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val lo = pos.toInt
    val hi = math.min(lo + 1, sorted.length - 1)
    sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 4) return null
    val vals = new Array[Double](n)
    var i = 0
    while (i < n) {
      val e = arr.get(i, elemType)
      if (e == null) throw new IllegalArgumentException(
        s"$prettyName: series contains a NULL sample")
      vals(i) = e match {
        case d: Double => d
        case f: Float  => f.toDouble
        case l: Long   => l.toDouble
        case x: Int    => x.toDouble
        case s: Short  => s.toDouble
        case b: Byte   => b.toDouble
        case d: Decimal => d.toDouble
        case other => throw new IllegalStateException(
          s"$prettyName: unexpected value $other")
      }
      i += 1
    }
    val sorted = vals.clone()
    java.util.Arrays.sort(sorted)
    val q1 = quantile(sorted, minPct)
    val q3 = quantile(sorted, maxPct)
    val iqr = q3 - q1
    val lo = q1 - k * iqr
    val hi = q3 + k * iqr
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) =
        if (vals(i) < lo) vals(i) - lo
        else if (vals(i) > hi) vals(i) - hi
        else 0.0
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
