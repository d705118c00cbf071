package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Running form of CH's exponentialTimeDecayed{Sum,Count,Max,Avg}
  * window family — O(1) state per row instead of the O(frame)
  * collect_list fold the SQL rewrite used before round 16.
  *
  * The naive two-factor rewrite (Σ v·e^(t/τ) rescaled by e^(−t_r/τ))
  * overflows double at epoch scale; the round-14 fix collected the
  * whole frame per row and folded with the anchor inside the exponent
  * — numerically right, but O(frame) list state per row: the 1500×601
  * rollup gate spent ~9.5 s re-walking prefixes (~270M struct visits
  * per function). This aggregate keeps the anchor inside the exponent
  * AND the state O(1): the buffer holds the decayed value RE-ANCHORED
  * AT THE LAST ROW SEEN — on each update the old state is rescaled by
  * e^((t_prev−t)/τ) (≤ 1 for ascending t, the CH contract) and the new
  * row added. Evaluated under a frame ending at CURRENT ROW, t_prev
  * equals the current row's t, which is exactly the fold's per-row
  * anchor; RANGE ties contribute factor e^0 = 1 in any order. Relative
  * fp divergence from the single-exp fold is ≤ steps·ulp (~1e-13 at
  * 601 steps), far inside the oracle's 6-dp rounding.
  *
  * The Compat rewriter emits this ONLY when the window frame provably
  * ends at the current row and is ordered by the same `t` argument
  * (the CH semantics); any other spelling keeps the fold. Used as a
  * WINDOW aggregate: Spark's UnboundedPrecedingWindowFunctionFrame
  * feeds rows in frame order via update() and never calls merge;
  * mergeExpressions nonetheless implement the time-ordered combine
  * (right buffer later than left) so a partial-ordered use is defined,
  * and the bare GROUP BY spelling stays refused in the registry (block
  * order is engine-internal — same refusal as before).
  *
  * Ref: CH docs exponentialTimeDecayedSum/Count/Max/Avg; reference
  * repo has no equivalent.
  */
case class DecayedWindowAgg(kind: String, v: Expression, t: Expression,
    tau: Expression) extends DeclarativeAggregate {

  require(DecayedWindowAgg.Kinds(kind), s"unknown decayed kind $kind")

  override def prettyName: String = s"__graft_decayed_$kind"
  override def children: Seq[Expression] = Seq(v, t, tau)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes numeric (value, time, tau)")

  // s: the decayed aggregate re-anchored at tl; c: decayed count (avg
  // only); tl: time of the last row folded in. NULL = no rows yet.
  private lazy val s = AttributeReference("s", DoubleType)()
  private lazy val c = AttributeReference("c", DoubleType)()
  private lazy val tl = AttributeReference("tl", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    if (kind == "avg") Seq(s, c, tl) else Seq(s, tl)

  override lazy val initialValues: Seq[Expression] =
    aggBufferAttributes.map(_ => Literal(null, DoubleType))

  private def dv = Cast(v, DoubleType)
  private def dt = Cast(t, DoubleType)
  private def dtau = Cast(tau, DoubleType)
  /** e^((t_prev − t_row)/τ): ≤ 1 for ascending t — never overflows on
    * the ordered frames the rewriter admits. */
  private def factor = Exp(Divide(Subtract(tl, dt), dtau))

  override lazy val updateExpressions: Seq[Expression] = {
    // a NULL t contributes nothing and cannot re-anchor (no time);
    // a NULL v with a valid t contributes nothing but DOES re-anchor
    // the decayed state at its t — the same answer as folding the
    // frame's non-NULL values with the decay anchored at the current
    // row's t (the fold spelling filters NULL entries and anchors at
    // d(t) of the current row)
    val tValid = IsNotNull(dt)
    val vValid = IsNotNull(dv)
    def keep(updated: Expression, prev: AttributeReference) =
      If(tValid, updated, prev)
    val contrib = kind match {
      case "count" => Literal(1.0)
      case _       => dv
    }
    val sRe = Multiply(s, factor) // old state re-anchored at this t
    val sUp = If(vValid,
      kind match {
        case "max" => If(IsNull(s), contrib, Greatest(Seq(sRe, contrib)))
        case _     => If(IsNull(s), contrib, Add(sRe, contrib))
      },
      sRe) // NULL v: re-anchor only (a NULL s stays NULL)
    if (kind == "avg") {
      val cUp = If(vValid,
        If(IsNull(c), Literal(1.0),
          Add(Multiply(c, factor), Literal(1.0))),
        Multiply(c, factor))
      Seq(keep(sUp, s), keep(cUp, c), keep(dt, tl))
    } else Seq(keep(sUp, s), keep(dt, tl))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // time-ordered combine: every row in the RIGHT buffer is at least
    // as late as every row in the LEFT (the only order a time-decayed
    // state composes under; window evaluation never calls this)
    val f = Exp(Divide(Subtract(tl.left, tl.right), dtau))
    def comb(a: AttributeReference, max: Boolean): Expression = {
      val rescaledL = Multiply(a.left, f)
      val both =
        if (max) Greatest(Seq(rescaledL, a.right))
        else Add(rescaledL, a.right)
      // NULL-v rows can set tl while the value stays NULL: a right
      // buffer with tl set but no value still re-anchors the left
      If(IsNull(a.right),
        If(IsNull(tl.right), a.left, rescaledL),
        If(IsNull(a.left), a.right, both))
    }
    val tlUp = Coalesce(Seq(tl.right, tl.left))
    if (kind == "avg")
      Seq(comb(s, max = false), comb(c, max = false), tlUp)
    else Seq(comb(s, max = kind == "max"), tlUp)
  }

  // with the frame ending at the current row, tl == t_row, so the
  // re-anchored state IS the decayed aggregate at the current row
  override lazy val evaluateExpression: Expression =
    if (kind == "avg") Divide(s, c) else s

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(v = newChildren(0), t = newChildren(1), tau = newChildren(2))
}

object DecayedWindowAgg {
  val Kinds: Set[String] = Set("sum", "count", "max", "avg")
}
