package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a naive time-range theta join into the
  * bucketed equi-join RangeJoin builds by hand.
  *
  * A user writing
  * {{{ a.join(b, a("k") === b("k") && b("ts") >= a("ts") - W && b("ts") <= a("ts") + W) }}}
  * gets a join whose only equi conjunct is k — fine — but with NO equi
  * conjunct (or a low-cardinality k) Spark must fall back to
  * BroadcastNestedLoopJoin: quadratic, a 100 TB killer. The reference
  * meets exactly this shape when attaching timeline events within ±15 s
  * of each kill (utils.py:541-580).
  *
  * The rewrite floors both timestamps into W-sized buckets, explodes the
  * right side into its bucket ±1, and joins on the bucket equi-key with
  * the original predicate kept as a refinement filter — same semantics
  * (every pair within ±W shares at least one bucket), but now a shuffled
  * hash/sort-merge join with bounded 3x fanout that AQE can skew-split.
  *
  * Conservative trigger: inner join, both range conjuncts present with
  * the same positive integer W on a LongType column pair, and NO
  * existing attribute-to-attribute equi conjunct — a join that already
  * has an equi key (including the hand-bucketed RangeJoin/Fights
  * operators, whose refine filter gets pushed back into the join
  * condition by PushPredicateThroughJoin) plans as a shuffled join
  * without help, and re-bucketing it would only add a redundant 3x
  * explode. Already-rewritten joins are also skipped via the marker
  * column name.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private val BucketName = "__graft_range_bucket"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && !alreadyBucketed(cond) && !hasEquiConjunct(cond, left, right) =>
      val conjuncts = splitConjuncts(cond)
      detectRange(conjuncts, left, right) match {
        case Some((lTs, rTs, w)) =>
          // left: project bucket = floor(ts / w)
          val lBucket = Alias(floorDiv(lTs, w), BucketName + "_l")()
          val newLeft = Project(left.output :+ lBucket, left)
          // right: explode bucket-1, bucket, bucket+1
          val rBase = floorDiv(rTs, w)
          val gen = Explode(CreateArray(Seq(
            Subtract(rBase, Literal(1L)), rBase, Add(rBase, Literal(1L)))))
          val rBucketAttr = AttributeReference(BucketName + "_r", LongType)()
          val newRight = Generate(gen, Nil, outer = false, None, Seq(rBucketAttr), right)
          val newCond = And(EqualTo(lBucket.toAttribute, rBucketAttr), cond)
          // restore the original schema
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        case None => j
      }
  }

  private def alreadyBucketed(cond: Expression): Boolean =
    cond.exists {
      case a: Attribute => a.name.startsWith(BucketName)
      case _ => false
    }

  /** Any equality conjunct whose two sides reference only-left and
    * only-right already makes the join equi-plannable (this is exactly
    * ExtractEquiJoinKeys' criterion — expression keys like
    * f(l.k) === f(r.k) count, not just bare attributes) — leave it
    * alone; re-bucketing would only add a redundant 3x explode.
    */
  private def hasEquiConjunct(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def crossSides(a: Expression, b: Expression): Boolean = {
      def onlyLeft(e: Expression) = e.references.nonEmpty && e.references.subsetOf(left.outputSet)
      def onlyRight(e: Expression) = e.references.nonEmpty && e.references.subsetOf(right.outputSet)
      (onlyLeft(a) && onlyRight(b)) || (onlyLeft(b) && onlyRight(a))
    }
    splitConjuncts(cond).exists {
      case EqualTo(a, b) => crossSides(a, b)
      case EqualNullSafe(a, b) => crossSides(a, b)
      case _ => false
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Exact integer floor division: (ts - pmod(ts, w)) div w. A
    * float-based floor(ts/w) is lossy for longs above 2^53 (nanosecond
    * epochs) and could mis-bucket near-boundary values, silently
    * dropping in-window pairs.
    */
  private def floorDiv(ts: Expression, w: Long): Expression =
    IntegralDivide(Subtract(ts, Pmod(ts, Literal(w))), Literal(w))

  /** Find `rTs >= lTs - w` and `rTs <= lTs + w` (either argument order)
    * over LongType attributes with the same literal w.
    */
  private def detectRange(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan
  ): Option[(Attribute, Attribute, Long)] = {
    def side(a: Attribute): Option[Boolean] = // true = left
      if (left.outputSet.contains(a)) Some(true)
      else if (right.outputSet.contains(a)) Some(false)
      else None

    // normalize to (rightAttr, leftAttr, w, isLower)
    def asBound(e: Expression): Option[(Attribute, Attribute, Long, Boolean)] = e match {
      case GreaterThanOrEqual(r: Attribute, Subtract(l: Attribute, Literal(w: Long, LongType), _))
          if side(r).contains(false) && side(l).contains(true) => Some((r, l, w, true))
      case LessThanOrEqual(Subtract(l: Attribute, Literal(w: Long, LongType), _), r: Attribute)
          if side(r).contains(false) && side(l).contains(true) => Some((r, l, w, true))
      case LessThanOrEqual(r: Attribute, Add(l: Attribute, Literal(w: Long, LongType), _))
          if side(r).contains(false) && side(l).contains(true) => Some((r, l, w, false))
      case GreaterThanOrEqual(Add(l: Attribute, Literal(w: Long, LongType), _), r: Attribute)
          if side(r).contains(false) && side(l).contains(true) => Some((r, l, w, false))
      case _ => None
    }

    val bounds = conjuncts.flatMap(asBound(_))
    val lower = bounds.filter(_._4)
    val upper = bounds.filterNot(_._4)
    (for {
      lo <- lower
      hi <- upper
      if lo._1 == hi._1 && lo._2 == hi._2 && lo._3 == hi._3 && lo._3 > 0
      if lo._1.dataType == LongType && lo._2.dataType == LongType
    } yield (lo._2, lo._1, lo._3)).headOption
  }
}
