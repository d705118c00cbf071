package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType,
  LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helpers for the round-13 scalar spellings — static methods
  * so the expressions below stay inside whole-stage codegen via
  * defineCodeGen (the [[IpOps]]/[[FormatReadableSize]] pattern).
  */
object ScalarOps {
  @scala.annotation.tailrec
  def gcd(a: Long, b: Long): Long = if (b == 0) math.abs(a)
    else gcd(b, a % b)

  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0L else math.abs(a / gcd(a, b) * b)

  /** CH `bar(x, min, max, width)` — a width-character horizontal bar
    * with 1/8-block precision: units = round-half-up of the [min,max]
    * fraction scaled to width·8; full blocks are █, the remainder one
    * of ▉▊▋▌▍▎▏ (U+2589..258F). Out-of-range x clamps. */
  def bar(x: Double, min: Double, max: Double, width: Long): UTF8String = {
    val frac =
      if (max <= min) 0.0
      else math.min(1.0, math.max(0.0, (x - min) / (max - min)))
    val units = math.floor(frac * width * 8.0 + 0.5).toLong
    val full = (units / 8).toInt
    val rem = (units % 8).toInt
    val sb = new java.lang.StringBuilder(full + 1)
    var i = 0
    while (i < full) { sb.append('█'); i += 1 }
    if (rem > 0) sb.append((0x2590 - rem).toChar)
    UTF8String.fromString(sb.toString)
  }

  private val decUnits =
    Array("B", "KB", "MB", "GB", "TB", "PB", "EB")

  /** CH `formatReadableDecimalSize`: the 1000-based sibling of
    * [[IpOps.formatReadableSize]] (KB/MB/..., not KiB/MiB), same
    * two-decimal HALF_EVEN rendering so the DuckDB printf('%.2f')
    * oracle reproduces it digit-for-digit. */
  def formatReadableDecimalSize(bytes: Double): UTF8String = {
    // non-finite inputs render printf-style instead of crashing the
    // BigDecimal constructor (NumberFormatException on NaN/Inf)
    if (bytes.isNaN) return UTF8String.fromString("nan")
    if (bytes.isInfinite) return UTF8String.fromString(
      if (bytes > 0) "inf" else "-inf")
    var v = bytes
    var u = 0
    while (math.abs(v) >= 1000.0 && u < decUnits.length - 1) {
      v = v / 1000.0
      u += 1
    }
    val s = new java.math.BigDecimal(v)
      .setScale(2, java.math.RoundingMode.HALF_EVEN)
      .toPlainString
    UTF8String.fromString(s + " " + decUnits(u))
  }

  private val qtyUnits = Array("", " thousand", " million", " billion",
    " trillion", " quadrillion")

  /** CH `formatReadableQuantity`: 1000-based unit words, two decimals
    * banker's-rounded like [[IpOps.formatReadableSize]]. */
  def formatReadableQuantity(v0: Double): UTF8String = {
    if (v0.isNaN) return UTF8String.fromString("nan")
    if (v0.isInfinite) return UTF8String.fromString(
      if (v0 > 0) "inf" else "-inf")
    var v = v0
    var u = 0
    while (math.abs(v) >= 1000.0 && u < qtyUnits.length - 1) {
      v = v / 1000.0
      u += 1
    }
    val s = new java.math.BigDecimal(v)
      .setScale(2, java.math.RoundingMode.HALF_EVEN)
      .toPlainString
    UTF8String.fromString(s + qtyUnits(u))
  }

  // documented breakdown constants: year = 365 d, month = 30 d (the
  // calendar-free convention; CH's own wording constants differ by
  // version, so ours are pinned here and in the spec)
  private val deltaUnits: Array[(String, Long)] = Array(
    "year" -> 31536000L, "month" -> 2592000L, "day" -> 86400L,
    "hour" -> 3600L, "minute" -> 60L, "second" -> 1L)

  /** CH `formatReadableTimeDelta(seconds)`: "2 years, 3 days, 1 hour"
    * — every non-zero unit named, singular/plural, zero reads
    * "0 seconds", negatives prefixed with a minus. */
  def formatReadableTimeDelta(v: Double): UTF8String = {
    val neg = v < 0
    var rest = math.abs(v).toLong
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    deltaUnits.foreach { case (name, secs) =>
      val n = rest / secs
      if (n > 0) {
        parts += s"$n $name" + (if (n > 1) "s" else "")
        rest -= n * secs
      }
    }
    if (parts.isEmpty) parts += "0 seconds"
    UTF8String.fromString((if (neg) "-" else "") + parts.mkString(", "))
  }

  private val geohashChars = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash encode (the public base-32 interleaved
    * bisection), precision in characters (CH's default 12). */
  def geohashEncode(lon: Double, lat: Double, precision: Long): UTF8String = {
    val p = math.max(1, math.min(12, precision.toInt))
    var (latLo, latHi) = (-90.0, 90.0)
    var (lonLo, lonHi) = (-180.0, 180.0)
    val sb = new java.lang.StringBuilder(p)
    var even = true
    var bit = 0
    var ch = 0
    while (sb.length < p) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(geohashChars.charAt(ch)); bit = 0; ch = 0 }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Geohash decode to the cell CENTER; index 0 = longitude,
    * 1 = latitude. Unknown characters throw (loud, never a wrong
    * coordinate). */
  def geohashDecode(s: UTF8String, idx: Int): Double = {
    var (latLo, latHi) = (-90.0, 90.0)
    var (lonLo, lonHi) = (-180.0, 180.0)
    var even = true
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i < str.length) {
      val cd = geohashChars.indexOf(str.charAt(i))
      if (cd < 0) throw new IllegalArgumentException(
        s"geohashDecode: invalid geohash character '${str.charAt(i)}'")
      var b = 4
      while (b >= 0) {
        val bit = (cd >> b) & 1
        if (even) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        even = !even
        b -= 1
      }
      i += 1
    }
    if (idx == 0) (lonLo + lonHi) / 2 else (latLo + latHi) / 2
  }
}

/** gcd/lcm over longs — CH spellings Spark lacks natively. */
case class GcdLcm(left: Expression, right: Expression, isGcd: Boolean)
    extends BinaryExpression {
  override def prettyName: String = if (isGcd) "gcd" else "lcm"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes longs, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isGcd) ScalarOps.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
    else ScalarOps.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val m = if (isGcd) "gcd" else "lcm"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ScalarOps.$m($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** CH `bar(x, min, max, width)` rendered via [[ScalarOps.bar]].
  * CodegenFallback: a display function on dashboard-sized result
  * sets, never a scan hot path. */
case class BarDraw(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen
      .CodegenFallback {
  override def prettyName: String = "bar"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.size == 4 && children.take(3).forall(
        _.dataType == DoubleType) && children(3).dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"$prettyName takes (x, min, max: double, width: long)")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else ScalarOps.bar(vs(0).asInstanceOf[Double],
      vs(1).asInstanceOf[Double], vs(2).asInstanceOf[Double],
      vs(3).asInstanceOf[Long])
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** Geohash encode — (lon, lat, precision) like CH (longitude first).
  * CodegenFallback: geo display/bucketing, not a scan hot path. */
case class GeohashEncode(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen
      .CodegenFallback {
  override def prettyName: String = "geohashEncode"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.size == 3 && children.take(2).forall(
        _.dataType == DoubleType) && children(2).dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"$prettyName takes (lon: double, lat: double, precision: long)")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else ScalarOps.geohashEncode(vs(0).asInstanceOf[Double],
      vs(1).asInstanceOf[Double], vs(2).asInstanceOf[Long])
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** One geohash-decoded coordinate (idx 0 = lon, 1 = lat); the Compat
  * builder pairs two of these into CH's (lon, lat) tuple. */
case class GeohashDecodeCoord(child: Expression, idx: Int)
    extends UnaryExpression {
  override def prettyName: String = "geohashDecode"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes a string geohash")
  override protected def nullSafeEval(s: Any): Any =
    ScalarOps.geohashDecode(s.asInstanceOf[UTF8String], idx)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ScalarOps.geohashDecode($c, $idx)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The gamma/error-function scalars behind CH's lgamma / tgamma /
  * erf / erfc spellings — dispatching to the house numerics
  * ([[StudentTPValue.lnGamma]], Lanczos ~1e-14; [[StatDist.erfc]],
  * incomplete-gamma split ~1e-14), well inside the driver's 6-decimal
  * float compare against DuckDB's libm. tgamma extends to negative
  * non-integers by Euler reflection; poles and lgamma's x <= 0 read
  * NULL (SQL's NaN-free contract).
  */
case class MathSpecial(child: Expression, fn: String)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen
      .CodegenFallback {
  override def prettyName: String = fn
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes a double")
  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    val r = fn match {
      case "lgamma" =>
        if (x > 0) StudentTPValue.lnGamma(x) else Double.NaN
      case "tgamma" =>
        if (x > 0) math.exp(StudentTPValue.lnGamma(x))
        else if (x == math.floor(x)) Double.NaN
        else math.Pi / (math.sin(math.Pi * x) *
          math.exp(StudentTPValue.lnGamma(1.0 - x)))
      case "erf" => 1.0 - StatDist.erfc(x)
      case _ => StatDist.erfc(x)
    }
    if (r.isNaN) null else java.lang.Double.valueOf(r)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** CH `byteSwap` read at this engine's one integer width: reverse the
  * byte order of the 64-bit two's-complement value (CH swaps at the
  * input's own width; Int64 is the documented contract here — swap a
  * narrower value by masking first). */
case class ByteSwap64(child: Expression)
    extends UnaryExpression {
  override def prettyName: String = "byteSwap"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes a bigint")
  override protected def nullSafeEval(v: Any): Any =
    java.lang.Long.reverseBytes(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Long.reverseBytes($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** formatReadableDecimalSize — the 1000-based [[FormatReadableSize]]
  * sibling, same codegen shape. */
case class FormatReadableDecimalSize(child: Expression)
    extends UnaryExpression {
  override def prettyName: String = "formatReadableDecimalSize"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes a double")
  override protected def nullSafeEval(v: Any): Any =
    ScalarOps.formatReadableDecimalSize(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ScalarOps.formatReadableDecimalSize($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** formatReadableQuantity / formatReadableTimeDelta — the
  * [[FormatReadableSize]] siblings, same codegen shape. */
case class FormatReadableMisc(child: Expression, quantity: Boolean)
    extends UnaryExpression {
  override def prettyName: String =
    if (quantity) "formatReadableQuantity" else "formatReadableTimeDelta"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes a double")
  override protected def nullSafeEval(v: Any): Any =
    if (quantity)
      ScalarOps.formatReadableQuantity(v.asInstanceOf[Double])
    else ScalarOps.formatReadableTimeDelta(v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val m = if (quantity) "formatReadableQuantity"
      else "formatReadableTimeDelta"
    defineCodeGen(ctx, ev, c => s"graft.functions.ScalarOps.$m($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
