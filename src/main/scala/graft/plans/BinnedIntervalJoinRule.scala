package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a pure interval-overlap inner join into the
  * binned equi-join form (SURVEY.md §4.3 — "the only justified
  * custom-optimizer candidate").
  *
  * Target pattern: an inner join whose condition contains the overlap
  * predicate pair
  *
  *   lStart <= rEnd  AND  rStart <= lEnd
  *
  * over LongType attributes, with NO equi-join conjunct between the
  * sides. Without this rule Catalyst can only plan such a join as
  * BroadcastNestedLoop/Cartesian — O(n·m) pair evaluations. The
  * rewrite explodes each side's interval into fixed-width bins
  * (Generate+Explode+Sequence), joins on bin equality (hash join,
  * shuffle-partitionable, AQE-skew-splittable), keeps the exact
  * overlap predicate as a residual, and anchors each matched pair to
  * the single bin containing its overlap start so no duplicate pairs
  * arise and no distinct is needed. Result set is provably identical
  * to the naive join.
  *
  * Joins that already have an equi conjunct are left alone — Catalyst
  * plans those as hash joins with the range residual, and the explode
  * would only add cost.
  *
  * Bin width: `spark.graft.intervalJoin.binWidth` (long, same unit as
  * the interval columns; default 60e6 = one minute in micros). Pick
  * ≈ the median interval length.
  *
  * Outlier-length intervals: the rewrite explodes O(len/binWidth) bin
  * rows per interval. Workloads where single intervals can span the
  * whole coordinate space (thousands of bins) should call
  * `operators.IntervalJoin.binnedCapped` explicitly — it routes rows
  * wider than `maxBinsPerRow` bins through a residual equi-key join
  * so the explosion stays bounded (property-pinned in OperatorsSpec).
  * The rule stays cap-free by design: a logical-plan Union rewrite
  * triples the plan for a case the operator API already handles.
  */
object BinnedIntervalJoinRule extends Rule[LogicalPlan] {

  private val BinWidthKey = "spark.graft.intervalJoin.binWidth"
  private val EnabledKey = "spark.graft.intervalJoin.enabled"

  private def longAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference if a.dataType == LongType => Some(a)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "true") != "true") return plan
    val binWidth = conf.getConfString(BinWidthKey, "60000000").toLong
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val preds = splitConjunctivePredicates(cond)
        val crossEqui = preds.exists {
          case EqualTo(a, b) =>
            (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
              (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
          case _ => false
        }
        val overlap = findOverlapPair(preds, left, right)
        if (crossEqui || overlap.isEmpty) j
        else {
          val (lStart, lEnd, rStart, rEnd) = overlap.get
          rewrite(j, left, right, preds, lStart, lEnd, rStart, rEnd, binWidth, hint)
        }
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
    case other => Seq(other)
  }

  /** Find (lStart, lEnd, rStart, rEnd) from `lStart <= rEnd` and
    * `rStart <= lEnd` conjuncts (either operand order).
    */
  private def findOverlapPair(
      preds: Seq[Expression], left: LogicalPlan, right: LogicalPlan)
      : Option[(AttributeReference, AttributeReference, AttributeReference, AttributeReference)] = {
    // normalized as (leftSideAttr, rightSideAttr) meaning leftAttr <= rightAttr
    val les = preds.flatMap {
      case LessThanOrEqual(a, b) =>
        (longAttr(a), longAttr(b)) match {
          case (Some(x), Some(y)) => Some((x, y))
          case _ => None
        }
      case GreaterThanOrEqual(a, b) =>
        (longAttr(b), longAttr(a)) match {
          case (Some(x), Some(y)) => Some((x, y))
          case _ => None
        }
      case _ => None
    }
    val fromLeft = les.filter { case (x, y) =>
      left.outputSet.contains(x) && right.outputSet.contains(y)
    } // lStart <= rEnd
    val fromRight = les.filter { case (x, y) =>
      right.outputSet.contains(x) && left.outputSet.contains(y)
    } // rStart <= lEnd
    for {
      (ls, re) <- fromLeft.headOption
      (rs, le) <- fromRight.headOption
    } yield (ls, le, rs, re)
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan, preds: Seq[Expression],
      lStart: AttributeReference, lEnd: AttributeReference,
      rStart: AttributeReference, rEnd: AttributeReference,
      binWidth: Long, hint: JoinHint): LogicalPlan = {
    val w = Literal(binWidth)
    def binOf(e: Expression): Expression = IntegralDivide(e, w)
    // Sequence is TimeZoneAware — without an explicit timeZoneId the
    // node is unresolved and plan validation rejects the rewrite.
    def binsFor(start: Expression, end: Expression): Expression =
      new Sequence(binOf(start), binOf(Greatest(Seq(end, start))),
        Some(Literal(1L)), Some(conf.sessionLocalTimeZone))

    val lBin = AttributeReference("__graft_lbin", LongType, nullable = false)()
    val rBin = AttributeReference("__graft_rbin", LongType, nullable = false)()
    val lGen = Generate(Explode(binsFor(lStart, lEnd)), Nil, outer = false,
      qualifier = None, generatorOutput = Seq(lBin), child = left)
    val rGen = Generate(Explode(binsFor(rStart, rEnd)), Nil, outer = false,
      qualifier = None, generatorOutput = Seq(rBin), child = right)

    val anchor = EqualTo(lBin, binOf(Greatest(Seq(lStart, rStart))))
    val newCond = (preds ++ Seq(EqualTo(lBin, rBin), anchor)).reduce(And)
    Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
  }
}
