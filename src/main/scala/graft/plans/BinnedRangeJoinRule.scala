package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Auto-binned range join: an optimizer rule that rewrites a
  * point-in-interval theta-join — `p.t >= i.lo AND p.t <= i.hi`, no
  * equi conjunct — into the binned EQUI-join [[graft.ops.RangeJoin]]
  * spells out by hand. Spark plans the bare form as a broadcast
  * nested loop (O(|P|·|I|) comparisons — fatal at scale); after the
  * rewrite, both sides carry a `t div W` bin column (the interval side
  * exploded across every bin it overlaps), the join is hash/merge on
  * the bin, and the ORIGINAL bound predicates remain as the exact
  * residual filter — so the rewrite is semantics-preserving for ANY
  * strictness mix (>, >=, <, <=): binning only over-covers, the
  * residual cuts exactly.
  *
  * Monotonicity makes truncating division safe for negatives too: for
  * W > 0, t ∈ [lo, hi] ⇒ (t div W) ∈ [lo div W, hi div W], so a true
  * pair always meets in the point's bin, and in exactly one bin — no
  * post-join dedup.
  *
  * Opt-in by setting `spark.graft.rangejoin.binwidth` to a positive
  * long in the units of the bound columns (pick it near the typical
  * interval span: interval replication stays O(1) while bins stay
  * selective). The rule fires only on INNER joins whose bound columns
  * are integral, with no existing equi conjunct (those already plan as
  * hash joins) — and never re-fires on its own output, which has one.
  */
case class BinnedRangeJoinRule() extends Rule[LogicalPlan]
    with PredicateHelper {

  private val ConfKey = "spark.graft.rangejoin.binwidth"

  private def binWidth: Option[Long] =
    conf.getConfString(ConfKey, "").toLongOption.filter(_ > 0)

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** (point expr, lo expr, hi expr, pointIsLeft) when the condition is a
    * pure two-sided range sandwich on a single point expression.
    */
  private def matchSandwich(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    // an equi conjunct across the sides means the planner already has a
    // hash key — leave the join alone
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (for (sa <- sideOf(a); sb <- sideOf(b)) yield sa != sb).getOrElse(false)
      case _ => false
    }
    if (hasEqui) return None
    // classify every cross-side comparison as a lower or upper bound on
    // its "point" operand: point >= bound  /  point <= bound
    sealed trait B
    case class Lower(pt: Expression, bound: Expression, ptLeft: Boolean) extends B
    case class Upper(pt: Expression, bound: Expression, ptLeft: Boolean) extends B
    def classify(c: Expression): Option[B] = {
      def mk(pt: Expression, bound: Expression, lower: Boolean): Option[B] =
        for {
          sp <- sideOf(pt); sb <- sideOf(bound)
          if sp != sb && pt.deterministic && bound.deterministic &&
            isIntegral(pt) && isIntegral(bound)
        } yield if (lower) Lower(pt, bound, sp) else Upper(pt, bound, sp)
      c match {
        case GreaterThanOrEqual(a, b) => mk(a, b, lower = true)
        case GreaterThan(a, b) => mk(a, b, lower = true)
        case LessThanOrEqual(a, b) => mk(a, b, lower = false)
        case LessThan(a, b) => mk(a, b, lower = false)
        case _ => None
      }
    }
    val classified = conjuncts.map(classify)
    if (classified.exists(_.isEmpty)) return None // unrecognized conjunct
    val bs = classified.flatten
    val lowers = bs.collect { case l: Lower => l }
    val uppers = bs.collect { case u: Upper => u }
    (lowers, uppers) match {
      case (Seq(Lower(pt1, lo, s1)), Seq(Upper(pt2, hi, s2)))
          if s1 == s2 && pt1.semanticEquals(pt2) =>
        Some((pt1, lo, hi, s1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && matchSandwich(cond, left, right).isDefined =>
        val (pt, lo, hi, ptLeft) = matchSandwich(cond, left, right).get
        val wLit = Literal(w, LongType)
        def div(e: Expression): Expression =
          new IntegralDivide(asLong(e), wLit)
        val (pointPlan, intervalPlan) = if (ptLeft) (left, right) else (right, left)
        // point side: one bin per row, a plain projection
        val pBin = Alias(div(pt), "__graft_bin_p")()
        val pointBinned = Project(pointPlan.output :+ pBin, pointPlan)
        // interval side: explode across every overlapped bin
        val iAttr = AttributeReference("__graft_bin_i", LongType,
          nullable = false)()
        // Sequence is timezone-aware; without an explicit zone the
        // expression stays unresolved post-analysis
        val seq = new Sequence(div(lo), div(hi))
          .withTimeZone(conf.sessionLocalTimeZone)
        val intervalBinned = Generate(
          Explode(seq),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(iAttr), child = intervalPlan)
        // bin equality carries the shuffle; the original sandwich is the
        // exact residual
        val newCond = And(EqualTo(pBin.toAttribute, iAttr), cond)
        val (newLeft, newRight) =
          if (ptLeft) (pointBinned, intervalBinned)
          else (intervalBinned, pointBinned)
        Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
