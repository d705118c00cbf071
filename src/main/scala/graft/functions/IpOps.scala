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

  /** dotted quad -> u32 as long; -1 on invalid (callers null it out). */
  def ipToLong(s: UTF8String): Long = {
    if (s == null) return -1L
    val str = s.toString
    val parts = str.split('.')
    if (parts.length != 4) return -1L
    var acc = 0L
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3) return -1L
      var j = 0
      var v = 0
      while (j < p.length) {
        val ch = p.charAt(j)
        if (ch < '0' || ch > '9') return -1L
        v = v * 10 + (ch - '0')
        j += 1
      }
      if (v > 255) return -1L
      acc = (acc << 8) | v
      i += 1
    }
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
