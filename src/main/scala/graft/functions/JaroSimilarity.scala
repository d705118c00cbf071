package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's `jaroSimilarity(a, b)` / `jaroWinklerSimilarity(a, b)`
  * — the fuzzy-match staples of entity-dedup pipelines, textbook
  * definitions:
  *
  *   Jaro: m matches within a window of ⌊max(|a|,|b|)/2⌋−1, t half
  *   the transpositions among matches;
  *   J = (m/|a| + m/|b| + (m−t)/m) / 3; both empty → 1, one empty → 0.
  *
  *   Jaro-Winkler: JW = J + ℓ·p·(1−J) with ℓ = common prefix capped
  *   at 4 and the standard scaling p = 0.1, applied only when J
  *   exceeds the standard boost threshold 0.7 (both ClickHouse and
  *   DuckDB gate the prefix bonus this way; below the threshold
  *   JW = J).
  *
  * Character-level (code-unit) comparison over Spark's UTF-16 string
  * representation — identical to DuckDB's jaro_similarity /
  * jaro_winkler_similarity for the ASCII fixtures the gates hash and
  * for any BMP text. Per-row O(|a|·window) with two small boolean
  * scratch arrays; CodegenFallback like the other scalar-similarity
  * expressions (the cost is the algorithm, not the dispatch).
  */
case class JaroSimilarity(left: Expression, right: Expression,
    winkler: Boolean)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String =
    if (winkler) "jaroWinklerSimilarity" else "jaroSimilarity"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes (string, string), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    val j = jaro(a, b)
    if (!winkler || j <= 0.7) j
    else {
      var prefix = 0
      val maxPrefix = math.min(4, math.min(a.length, b.length))
      while (prefix < maxPrefix && a.charAt(prefix) == b.charAt(prefix))
        prefix += 1
      j + prefix * 0.1 * (1.0 - j)
    }
  }

  private def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var k = lo
      var found = false
      while (k <= hi && !found) {
        if (!bMatch(k) && a.charAt(i) == b.charAt(k)) {
          aMatch(i) = true
          bMatch(k) = true
          m += 1
          found = true
        }
        k += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t / 2.0) / md) / 3.0
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
