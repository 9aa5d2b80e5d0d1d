package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite band (time-range) joins into bucketed equi
  * joins.
  *
  * Spark plans an inner join whose only usable predicates are range
  * comparisons as a BroadcastNestedLoopJoin or CartesianProduct —
  * quadratic, the single worst plan shape at scale. With an equi key
  * alongside the range, Spark hash-joins on the key instead — no NLJ,
  * but every same-key pair is still compared, which is quadratic in any
  * hot key (one heavy user = one giant task). A conjunction that bounds
  * the difference of one long-valued expression pair from the two
  * sides — `lo <= r.t - l.t <= hi`, the shape of every event-window
  * join — admits the classic bucketing rewrite in both cases
  * ([[graft.operators.RangeJoin]], here applied automatically): with
  * bucket width `W = hi - lo + 1`, any matching right row lies in one
  * of (at most) two consecutive buckets of the left row, so the rule
  * explodes the left side to those buckets, equi-joins on
  * (bucket [, original equi keys]), and re-applies the original range
  * predicates exactly. Same rows, partition-parallel shuffle join.
  *
  * The rule fires on Inner joins whose condition contains both a lower
  * and an upper bound on the same expression pair (each side's
  * expression may carry literal long offsets, e.g.
  * `unix_micros(r.ts) >= unix_micros(l.ts) - 86400000000`); every other
  * conjunct is preserved in a filter above the new join. A tag plus a
  * marker attribute name keep the fixed-point optimizer from rewriting
  * its own output after predicate pushdown re-inlines the range
  * conjuncts into the join condition.
  *
  * Install via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (session build) or `GraftExtensions.installRangeJoinRewrite(spark)`
  * (live session, `experimental.extraOptimizations`).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val rewritten = TreeNodeTag[Boolean]("graft.rangeJoinRewritten")
  private val BucketCol = "__graft_bkt"

  /** (base expression, literal offset) for one comparison operand, when
    * it is a long expression over exactly one join side plus literal
    * adjustments. */
  private def peel(e: Expression): Option[(Expression, Long)] = e match {
    case Add(x, Literal(o: Long, LongType), _)      => peel(x).map { case (b, c) => (b, c + o) }
    case Add(Literal(o: Long, LongType), x, _)      => peel(x).map { case (b, c) => (b, c + o) }
    case Subtract(x, Literal(o: Long, LongType), _) => peel(x).map { case (b, c) => (b, c - o) }
    case b if b.dataType == LongType && b.deterministic => Some((b, 0L))
    case _ => None
  }

  private final case class Bound(lBase: Expression, rBase: Expression, lo: Option[Long], hi: Option[Long])

  /** Normalize one conjunct into a bound on `rBase - lBase`, given the
    * output sets of the two sides. */
  private def asBound(
      c: Expression,
      leftSet: AttributeSet,
      rightSet: AttributeSet): Option[Bound] = {
    def sided(e: Expression): Option[(Expression, Long, Boolean)] =
      peel(e).flatMap { case (b, off) =>
        if (b.references.nonEmpty && b.references.subsetOf(leftSet)) Some((b, off, true))
        else if (b.references.nonEmpty && b.references.subsetOf(rightSet)) Some((b, off, false))
        else None
      }
    // cmp(x, y): bound on d = rBase - lBase
    def mk(x: Expression, y: Expression, strictGt: Boolean, orEqual: Boolean): Option[Bound] =
      (sided(x), sided(y)) match {
        case (Some((xb, xo, xIsLeft)), Some((yb, yo, yIsLeft))) if xIsLeft != yIsLeft =>
          // x > y (or >=): if x is right → d > yo - xo (lower); else d < xo - yo (upper)
          val _ = strictGt
          if (!xIsLeft) {
            val lo = yo - xo + (if (orEqual) 0 else 1)
            Some(Bound(yb, xb, Some(lo), None))
          } else {
            val hi = xo - yo - (if (orEqual) 0 else 1)
            Some(Bound(xb, yb, None, Some(hi)))
          }
        case _ => None
      }
    c match {
      case GreaterThan(a, b)        => mk(a, b, strictGt = true, orEqual = false)
      case GreaterThanOrEqual(a, b) => mk(a, b, strictGt = true, orEqual = true)
      case LessThan(a, b)           => mk(b, a, strictGt = true, orEqual = false)
      case LessThanOrEqual(a, b)    => mk(b, a, strictGt = true, orEqual = true)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.getTagValue(rewritten).isEmpty &&
          !j.output.exists(a => a.name.startsWith(BucketCol) || a.name.startsWith("__bkt")) &&
          j.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(c => asBound(c, left.outputSet, right.outputSet).map(c -> _))
      // bounds grouped by the (lBase, rBase) pair they constrain
      val grouped = bounds.groupBy { case (_, b) => (b.lBase.canonicalized, b.rBase.canonicalized) }
      grouped.collectFirst {
        case (_, bs)
            if bs.exists(_._2.lo.isDefined) && bs.exists(_._2.hi.isDefined) &&
              bs.flatMap(_._2.lo).max <= bs.flatMap(_._2.hi).min =>
          bs
      } match {
        case None => j
        case Some(bs) =>
          val lBase = bs.head._2.lBase
          val rBase = bs.head._2.rBase
          val lo = bs.flatMap(_._2.lo).max
          val hi = bs.flatMap(_._2.hi).min
          val w = hi - lo + 1 // covers the inclusive span; exactness comes from re-applied predicates

          def bucket(x: Expression): Expression =
            IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

          // left: explode to the <= 2 candidate buckets
          val bktL = AttributeReference(BucketCol + "_l", LongType)()
          val arr = ArrayDistinct(CreateArray(Seq(
            bucket(Add(lBase, Literal(lo))), bucket(Add(lBase, Literal(hi))))))
          val lGen = Generate(Explode(arr), Nil, outer = false, None, Seq(bktL), left)
          // right: its single bucket
          val rAlias = Alias(bucket(rBase), BucketCol + "_r")()
          val rProj = Project(right.output :+ rAlias, right)

          // original equi conjuncts join alongside the bucket equality;
          // everything else (the range bounds included) filters exactly
          val (eqs, rest) = conjuncts.partition {
            case EqualTo(a, b) =>
              (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
                (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
            case _ => false
          }
          val joinCond = (eqs :+ EqualTo(bktL, rAlias.toAttribute)).reduce(And)
          val newJoin = Join(lGen, rProj, Inner, Some(joinCond), hint)
          newJoin.setTagValue(rewritten, true)
          val filtered = rest match {
            case Nil => newJoin
            case cs  => Filter(cs.reduce(And), newJoin)
          }
          Project(left.output ++ right.output, filtered)
      }
  }
}
