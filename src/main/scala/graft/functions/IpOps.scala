package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Runtime helpers behind the IP / formatting expressions.
  *
  * Kept as a top-level object so whole-stage-codegen'd Java can call the
  * static forwarders (`graft.functions.IpOps.longToIp(...)`) directly —
  * the expressions below stay inside WholeStageCodegen spans instead of
  * falling back to interpreted eval.
  *
  * Semantics follow the reference's use of Go `netip` (private/loopback/
  * link-local checks, /root/reference/pkg/labeler/remote.go:135) and
  * big-endian u32 IPv4 packing (pkg/collector/collector.go:253-255).
  */
object IpOps {
  /** u32 (as long) -> dotted quad. */
  def longToIp(v: Long): UTF8String = {
    val a = (v >> 24) & 0xff
    val b = (v >> 16) & 0xff
    val c = (v >> 8) & 0xff
    val d = v & 0xff
    UTF8String.fromString(s"$a.$b.$c.$d")
  }

  /** dotted quad -> u32 as long; -1 on invalid (callers null it out).
    * Strict per Go `netip.ParseAddr` (the reference's parser): exactly
    * 4 octets, no trailing dot (`"1.2.3.4."` invalid), no leading zeros
    * (`"010.1.1.1"` invalid — ambiguous octal). Parsed with a manual
    * char walk: `String.split` silently drops trailing empty fields.
    */
  def ipToLong(s: UTF8String): Long = {
    if (s == null) return -1L
    val str = s.toString
    val n = str.length
    var acc = 0L
    var octets = 0
    var i = 0
    while (i < n) {
      var v = 0
      var digits = 0
      val start = i
      while (i < n && str.charAt(i) >= '0' && str.charAt(i) <= '9') {
        v = v * 10 + (str.charAt(i) - '0')
        digits += 1
        i += 1
      }
      if (digits == 0 || digits > 3 || v > 255) return -1L
      if (digits > 1 && str.charAt(start) == '0') return -1L // leading zero
      acc = (acc << 8) | v
      octets += 1
      if (i < n) {
        if (str.charAt(i) != '.' || octets == 4) return -1L
        i += 1
        if (i == n) return -1L // trailing dot
      }
    }
    if (octets != 4) return -1L
    acc
  }

  /** RFC1918 private, loopback, or link-local (remote.go:135 semantics:
    * `IsPrivate || IsLoopback || IsLinkLocalUnicast`). */
  def ipIsPrivate(v: Long): Boolean = {
    val b1 = (v >> 24) & 0xff
    val b2 = (v >> 16) & 0xff
    (b1 == 10) ||
    (b1 == 172 && b2 >= 16 && b2 <= 31) ||
    (b1 == 192 && b2 == 168) ||
    (b1 == 127) ||
    (b1 == 169 && b2 == 254)
  }

  private val units =
    Array("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB")

  /** ClickHouse-style formatReadableSize (README.md:180): divide by 1024
    * until < 1024, print with 2 decimals. Rounding is HALF_EVEN to match
    * C printf's correctly-rounded decimal conversion (the DuckDB oracle
    * reimplements this with printf('%.2f')).
    */
  def formatReadableSize(bytes: Double): UTF8String = {
    // non-finite inputs render printf-style instead of crashing the
    // BigDecimal constructor (same guard as the decimal sibling)
    if (bytes.isNaN) return UTF8String.fromString("nan")
    if (bytes.isInfinite) return UTF8String.fromString(
      if (bytes > 0) "inf" else "-inf")
    var v = bytes
    var u = 0
    while (math.abs(v) >= 1024.0 && u < units.length - 1) {
      v = v / 1024.0
      u += 1
    }
    val s = new java.math.BigDecimal(v)
      .setScale(2, java.math.RoundingMode.HALF_EVEN)
      .toPlainString
    UTF8String.fromString(s + " " + units(u))
  }
}
