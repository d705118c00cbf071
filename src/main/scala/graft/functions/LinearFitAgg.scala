package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Backs the CH `stochasticLinearRegression[State](lr, l2, batch,
  * 'method')(y, x1..xn)` spelling with the EXACT multi-feature least
  * squares / ridge solution — a documented, deliberate deviation:
  * ClickHouse fits by merge-averaged SGD whose answer depends on row
  * and merge order (its docs call the parallel merge quality out as
  * heuristic); a distributed engine should not ship order-dependent
  * numbers, and for the linear model the exact answer is cheaply
  * computable at any scale, so the SGD knobs (learning rate, batch
  * size, method) are accepted and IGNORED, while the l2 coefficient
  * becomes the ridge λ on (X'X + λI)w = X'y (intercept unpenalized,
  * the textbook convention).
  *
  * State is the upper triangle of the augmented Gram matrix X̃'X̃
  * (X̃ = [x, 1]) plus X̃'y — O(d²) doubles for d = n_features + 1,
  * independent of row count, merged by plain addition, so partial
  * aggregation runs map-side and 100 TB of rows ship d(d+3)/2 numbers
  * per partition. The d×d solve (Gaussian elimination, partial
  * pivoting) happens once per group at eval. Singular systems
  * (constant features, fewer rows than features) yield NULL rather
  * than a garbage fit.
  *
  * Result: array<double> of length d — [w1..wn, intercept] — the
  * shape [[EvalMLMethod]] consumes, mirroring CH's
  * `...State -> evalMLMethod` workflow.
  */
case class LinearFitAgg(lambda: Double, y: Expression,
    xs: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(xs.nonEmpty && xs.size <= 64,
    s"stochasticLinearRegression takes 1..64 features, got ${xs.size}")
  require(lambda >= 0.0, s"l2 coefficient must be >= 0, got $lambda")

  private val d = xs.size + 1 // features + intercept
  // buffer layout: upper triangle of X'X row-major (d(d+1)/2), then
  // X'y (d)
  private val triN = d * (d + 1) / 2

  override def prettyName: String = "stochasticLinearRegression"
  override def children: Seq[Expression] = y +: xs
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[NumericType]))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName takes numeric (target, " +
        s"features...), got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](triN + d)

  private def asD(v: Any): Double = v match {
    case x: Double => x
    case x: Float  => x.toDouble
    case x: Long   => x.toDouble
    case x: Int    => x.toDouble
    case x: Short  => x.toDouble
    case x: Byte   => x.toDouble
    case x: Decimal => x.toDouble
    case other => throw new IllegalStateException(
      s"$prettyName: unexpected value $other")
  }

  override def update(buf: Array[Double],
      input: InternalRow): Array[Double] = {
    val yv = y.eval(input)
    if (yv == null) return buf
    val row = new Array[Double](d)
    var i = 0
    while (i < xs.size) {
      val v = xs(i).eval(input)
      if (v == null) return buf // any-null row skips entirely
      row(i) = asD(v)
      i += 1
    }
    row(d - 1) = 1.0 // intercept column
    val yd = asD(yv)
    var k = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        buf(k) += row(i) * row(j)
        k += 1
        j += 1
      }
      buf(triN + i) += row(i) * yd
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    // densify the Gram matrix, ridge on the feature diagonal
    val m = Array.ofDim[Double](d, d + 1)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        m(i)(j) = buf(k)
        m(j)(i) = buf(k)
        k += 1
        j += 1
      }
      m(i)(d) = buf(triN + i)
      i += 1
    }
    i = 0
    while (i < d - 1) { m(i)(i) += lambda; i += 1 }
    // Gaussian elimination, partial pivoting
    i = 0
    while (i < d) {
      var p = i
      var j = i + 1
      while (j < d) {
        if (math.abs(m(j)(i)) > math.abs(m(p)(i))) p = j
        j += 1
      }
      if (math.abs(m(p)(i)) < 1e-10) return null // singular
      val t = m(i); m(i) = m(p); m(p) = t
      j = i + 1
      while (j < d) {
        val f = m(j)(i) / m(i)(i)
        var c = i
        while (c <= d) { m(j)(c) -= f * m(i)(c); c += 1 }
        j += 1
      }
      i += 1
    }
    val w = new Array[Double](d)
    i = d - 1
    while (i >= 0) {
      var s = m(i)(d)
      var j = i + 1
      while (j < d) { s -= m(i)(j) * w(j); j += 1 }
      w(i) = s / m(i)(i)
      i -= 1
    }
    new GenericArrayData(w.map(x => x: Any))
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): LinearFitAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LinearFitAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(y = newChildren.head, xs = newChildren.tail)
}

/** CH `evalMLMethod(state, x1..xn)` — apply a fitted
  * [[LinearFitAgg]] weight array: Σ wᵢxᵢ + intercept. NULL state (a
  * singular fit) or NULL feature yields NULL. */
case class EvalMLMethod(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def prettyName: String = "evalMLMethod"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.size < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName takes (weights, features...)")
    else if (!children.head.dataType
        .isInstanceOf[ArrayType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName first argument must be the " +
          s"fitted weight array, got " +
          children.head.dataType.simpleString)
    else if (!children.tail.forall(
        _.dataType.isInstanceOf[NumericType]))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName features must be numeric")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val w = children.head.eval(input)
    if (w == null) return null
    val arr = w.asInstanceOf[ArrayData]
    val n = children.size - 1
    if (arr.numElements() != n + 1) throw new IllegalArgumentException(
      s"$prettyName: weight array has ${arr.numElements()} entries, " +
        s"expected ${n + 1} (features + intercept)")
    var s = arr.getDouble(n) // intercept
    var i = 0
    while (i < n) {
      val v = children(i + 1).eval(input)
      if (v == null) return null
      val dv = v match {
        case x: Double => x
        case x: Float  => x.toDouble
        case x: Long   => x.toDouble
        case x: Int    => x.toDouble
        case x: Short  => x.toDouble
        case x: Byte   => x.toDouble
        case x: Decimal => x.toDouble
        case other => throw new IllegalStateException(
          s"$prettyName: unexpected value $other")
      }
      s += arr.getDouble(i) * dv
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
