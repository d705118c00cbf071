package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse's `isIPv6String(s)` — a real try-parse, not a regex
  * approximation. Grammar (RFC 4291 §2.2, what CH's parseIPv6
  * accepts):
  *
  *   - 1–4 hex-digit groups separated by ':'
  *   - exactly 8 groups, OR at most one '::' standing in for one or
  *     more zero groups (so < 8 explicit groups)
  *   - an optional dotted-quad IPv4 tail replacing the last TWO
  *     groups ('::ffff:1.2.3.4'), each octet 0–255 with no leading
  *     '+'/whitespace
  *   - no zone index ('%eth0') — CH rejects those too
  *
  * The previous regex accepted 'fe80:::1' and multiple '::' and
  * rejected IPv4-mapped forms; this walks the string once instead.
  * Pure JVM scalar, CodegenFallback like the other per-row string
  * validators (the cost is the scan, not the dispatch).
  */
case class IsIpv6String(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "isIPv6String"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes a string, got " +
        child.dataType.simpleString)

  override protected def nullSafeEval(v: Any): Any =
    IsIpv6String.valid(v.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object IsIpv6String {
  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
      (c >= 'A' && c <= 'F')

  /** Validate a dotted-quad IPv4 tail (strict: 0–255, no empty or
    * 4+-digit octets, no leading-zero looseness beyond what inet_aton
    * canonically allows — CH requires plain decimal octets).
    */
  private def validV4(s: String, from: Int): Boolean = {
    var i = from
    var octets = 0
    while (octets < 4) {
      var digits = 0
      var value = 0
      while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9' &&
          digits < 4) {
        value = value * 10 + (s.charAt(i) - '0')
        digits += 1
        i += 1
      }
      if (digits == 0 || digits > 3 || value > 255) return false
      // '01' style leading zeros: CH's parser accepts only canonical
      // decimal; a multi-digit octet must not start with '0'
      if (digits > 1 && s.charAt(i - digits) == '0') return false
      octets += 1
      if (octets < 4) {
        if (i >= s.length || s.charAt(i) != '.') return false
        i += 1
      }
    }
    i == s.length
  }

  def valid(s: String): Boolean = {
    val n = s.length
    if (n < 2) return false
    var i = 0
    var groups = 0          // explicit 16-bit groups consumed
    var sawCompress = false // '::' seen
    // leading '::' (plain ':' alone is invalid)
    if (s.charAt(0) == ':') {
      if (s.charAt(1) != ':') return false
      sawCompress = true
      i = 2
      if (i == n) return true // '::'
    }
    while (i < n) {
      // try a dotted-quad tail in the final position
      val rest = s.indexOf(':', i)
      if (rest < 0 && s.indexOf('.', i) >= 0) {
        // tail counts as two groups
        return validV4(s, i) &&
          (if (sawCompress) groups + 2 <= 7 else groups + 2 == 8)
      }
      var digits = 0
      while (i < n && isHex(s.charAt(i)) && digits < 5) {
        digits += 1
        i += 1
      }
      if (digits == 0 || digits > 4) return false
      groups += 1
      if (i == n) {
        return if (sawCompress) groups <= 7 else groups == 8
      }
      if (s.charAt(i) != ':') return false
      i += 1
      if (i < n && s.charAt(i) == ':') {
        if (sawCompress) return false // second '::'
        sawCompress = true
        i += 1
        if (i == n) return groups <= 7 // trailing '::'
      } else if (i == n) {
        return false // trailing single ':'
      }
    }
    false
  }
}
