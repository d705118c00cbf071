package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's `damerauLevenshteinDistance(a, b)` — the UNRESTRICTED
  * Damerau-Levenshtein edit distance (insert, delete, substitute,
  * transpose-with-intervening-edits), the textbook alphabet-indexed
  * dynamic program — NOT the cheaper optimal-string-alignment
  * restriction (OSA forbids edits between a transposed pair; the two
  * differ on e.g. "CA" → "ABC": OSA 3, true DL 2). DuckDB's
  * `damerau_levenshtein` computes the same unrestricted form (probed:
  * ('CA','ABC') → 2), which is what makes this oracle-checkable.
  *
  * Character-level over Spark's UTF-16 representation — identical to
  * byte-level for the ASCII fixtures the gates hash and correct for
  * any BMP text. O(|a|·|b|) time, O(|a|·|b|) scratch (the
  * transposition lookback needs the full matrix); CodegenFallback
  * like [[JaroSimilarity]] — the cost is the algorithm, not the
  * dispatch.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "damerauLevenshteinDistance"
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes (string, string), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    java.lang.Long.valueOf(distance(a, b).toLong)
  }

  // the unrestricted algorithm needs the FULL matrix (the
  // transposition lookback reaches arbitrarily far up), so memory is
  // O(|a|·|b|) — cap the operand lengths the way CH caps its string
  // functions rather than letting a pair of document bodies OOM an
  // executor
  private val MaxLen = 8192

  private def distance(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    require(la <= MaxLen && lb <= MaxLen,
      s"damerauLevenshteinDistance: operand lengths $la/$lb exceed " +
        s"the $MaxLen-char cap (the unrestricted algorithm keeps an " +
        "O(|a|*|b|) matrix); truncate or use levenshteinDistance")
    val inf = la + lb
    // (la+2) x (lb+2) matrix with the textbook sentinel border
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(1) = i; d(i + 1)(0) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(1)(j + 1) = j; d(0)(j + 1) = inf; j += 1 }
    // last row index where each character of the alphabet occurred in a
    val da = new java.util.HashMap[Char, Int]()
    i = 1
    while (i <= la) {
      var db = 0 // last column in this row where a match occurred
      j = 1
      while (j <= lb) {
        val k = da.getOrDefault(b.charAt(j - 1), 0)
        val l0 = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) {
          db = j; 0
        } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l0) + (i - k - 1) + 1 + (j - l0 - 1)
        d(i + 1)(j + 1) =
          math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}
