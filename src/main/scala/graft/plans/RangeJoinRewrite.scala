package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite band (time-range) joins into bucketed equi
  * joins.
  *
  * Spark plans an inner join whose only usable predicates are range
  * comparisons as a BroadcastNestedLoopJoin or CartesianProduct —
  * quadratic, the single worst plan shape at scale. With an equi key
  * alongside the range, Spark hash-joins on the key instead — no NLJ,
  * but every same-key pair is still compared, which is quadratic in any
  * hot key (one heavy user = one giant task). A conjunction that bounds
  * the difference of one expression pair from the two sides —
  * `lo <= r.t - l.t <= hi`, the shape of every event-window join —
  * admits the classic bucketing rewrite in both cases
  * ([[graft.operators.RangeJoin]], here applied automatically): with
  * bucket width `W = hi - lo + 1`, any matching right row lies in one
  * of (at most) two consecutive buckets of the left row, so the rule
  * explodes the left side to those buckets, equi-joins on
  * (bucket [, original equi keys]), and re-applies the original range
  * predicates exactly. Same rows, partition-parallel shuffle join.
  *
  * Bound detection works in an exact Long image of the comparison's
  * value space, one mapping per type family:
  *   - `LongType`: the expression itself, literal `+`/`-` offsets peeled;
  *   - `IntegerType`: `Cast(_, LongType)` (exact), Int literal offsets;
  *   - `TimestampType`: `unix_micros(_)`, day-time interval literal
  *     offsets from `ts ± INTERVAL` arithmetic (micros-exact; year-month
  *     intervals are not constant-width and never match);
  *   - `DateType`: `unix_date(_)` cast to Long, `date_add`/`date_sub`
  *     literal day offsets.
  * Both comparison operands share one type family (the comparison
  * type-checked), so the difference space is consistent; the original
  * predicates are re-applied verbatim, so the rewrite's exactness never
  * depends on the mapping — the mapping only has to put every true
  * match in one of the two candidate buckets.
  *
  * Join types:
  *   - **Inner**: explode left to its ≤ 2 candidate buckets, equi-join,
  *     re-filter. Each right row carries exactly one bucket, so no
  *     duplicate pairs arise.
  *   - **LeftOuter**: the same bucketed join run LEFT OUTER over the
  *     exploded left would emit one null row per *bucket copy*, not per
  *     left row. The rewrite tags each left row with a per-execution id
  *     ([[MonotonicallyIncreasingID]] — consumed entirely inside this
  *     one plan, so its nondeterminism across executions is harmless),
  *     left-outer-joins the exploded side with the FULL original
  *     condition in the ON clause, and resolves copies with one window
  *     pass per id: keep every matched row; keep exactly one null row
  *     iff the id matched nowhere. One extra hash shuffle on the id —
  *     linear, against the quadratic BNLJ it replaces. Only fires when
  *     every expression in the left subtree is deterministic: a
  *     distributed stage retry recomputes lost left partitions, and a
  *     nondeterministic left (e.g. `rand()`) could put different rows
  *     under an already-consumed id, duplicating or suppressing null
  *     rows. (Order-nondeterminism under round-robin repartition is
  *     already neutralized by Spark's sort-before-repartition.)
  *   - **LeftSemi / LeftAnti**: explode the RIGHT side instead — a
  *     matching left row satisfies `lBase ∈ [rBase-hi, rBase-lo]`, an
  *     interval also of width W, so each right row lands in the ≤ 2
  *     buckets a matching left row's single bucket could be. Semi/anti
  *     joins only test *existence* against the right side, so right-row
  *     duplication is invisible and no id/window copy-resolution is
  *     needed: plain LEFT SEMI (or ANTI) on bucket equality with the
  *     full original condition in the ON clause.
  *   - **RightOuter**: the LeftOuter construction with the sides
  *     swapped and the band mirrored to `[-hi, -lo]` (the preserved
  *     right side carries the uid and must be deterministic; per-side
  *     hints swap; a final projection restores the original column
  *     order). The size guard checks the LEFT side here — the only
  *     side stock Spark can broadcast-build for a right outer join.
  *   - **FullOuter**: the LeftOuter construction UNION ALL the right
  *     rows that matched nothing (the LeftAnti construction with sides
  *     swapped and the band mirrored to `[-hi, -lo]`), left columns
  *     null-padded. Composing the two proven linear shapes sidesteps
  *     the skew a windowed full-outer would create (every unmatched
  *     right row shares the null uid = one window partition); the cost
  *     is a second bucketed pass over both inputs, which must therefore
  *     both be deterministic.
  *
  * **Size guard**: the rewrite declines only when the right side is
  * small in BOTH bytes and estimated rows: `stats.sizeInBytes` at or
  * under `spark.graft.rangeJoinRewrite.smallRightBytes` (default: the
  * session's `spark.sql.autoBroadcastJoinThreshold`) AND estimated
  * rows (`stats.rowCount`, else sizeInBytes over the schema's
  * per-row width) at or under `spark.graft.rangeJoinRewrite
  * .smallRightRows` (default 65536). A right side that small
  * broadcasts, and Spark's stock broadcast hash/nested-loop join costs
  * no shuffle at all — two shuffles plus a window would be a
  * pessimization. Bytes alone are not enough: a byte-small but
  * row-heavy right (9 MB of narrow rows = millions) broadcasts into a
  * BroadcastNestedLoopJoin that compares every right row against every
  * left row — exactly the quadratic this rule exists to kill — so such
  * sides rewrite. Either knob at -1 disables its half of the guard;
  * malformed values log a warning and fall back to the default rather
  * than failing the optimizer. Leaves without real statistics saturate
  * to `defaultSizeInBytes`/Long.MaxValue and therefore rewrite — the
  * safe direction at scale. The gate harnesses (Verify/Bench) lower
  * the bytes knob to 64 KB because the whole sf0.1 fixture set is
  * megabytes.
  *
  * A tag plus a marker attribute name keep the fixed-point optimizer
  * from rewriting its own output after predicate pushdown re-inlines
  * the range conjuncts into the join condition.
  *
  * Install via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (session build) or `GraftExtensions.installRangeJoinRewrite(spark)`
  * (live session, `experimental.extraOptimizations`).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val rewritten = TreeNodeTag[Boolean]("graft.rangeJoinRewritten")
  private val BucketCol = "__graft_bkt"

  /** (Long-valued image of the base, literal offset in that image) for
    * one comparison operand. Offset arithmetic assumes no overflow in
    * the original expression — the ANSI default, where overflow throws
    * instead of wrapping. */
  private def peel(e: Expression): Option[(Expression, Long)] = {
    if (!e.deterministic) return None
    e.dataType match {
      case LongType =>
        e match {
          case Add(x, Literal(o: Long, LongType), _)      => peel(x).map { case (b, c) => (b, c + o) }
          case Add(Literal(o: Long, LongType), x, _)      => peel(x).map { case (b, c) => (b, c + o) }
          case Subtract(x, Literal(o: Long, LongType), _) => peel(x).map { case (b, c) => (b, c - o) }
          case b => Some((b, 0L))
        }
      case IntegerType =>
        e match {
          case Add(x, Literal(o: Int, IntegerType), _)      => peel(x).map { case (b, c) => (b, c + o) }
          case Add(Literal(o: Int, IntegerType), x, _)      => peel(x).map { case (b, c) => (b, c + o) }
          case Subtract(x, Literal(o: Int, IntegerType), _) => peel(x).map { case (b, c) => (b, c - o) }
          case b => Some((Cast(b, LongType), 0L))
        }
      case TimestampType =>
        e match {
          // ts ± INTERVAL folds to TimestampAddInterval with a (possibly
          // negative) day-time interval literal, whose value is micros
          case TimestampAddInterval(x, Literal(o: Long, _: DayTimeIntervalType), _) =>
            peel(x).map { case (b, c) => (b, c + o) }
          case b => Some((UnixMicros(b), 0L))
        }
      case DateType =>
        e match {
          case DateAdd(x, Literal(o: Int, IntegerType)) => peel(x).map { case (b, c) => (b, c + o) }
          case DateSub(x, Literal(o: Int, IntegerType)) => peel(x).map { case (b, c) => (b, c - o) }
          case b => Some((Cast(UnixDate(b), LongType), 0L))
        }
      case _ => None
    }
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
    def mk(x: Expression, y: Expression, orEqual: Boolean): Option[Bound] =
      (sided(x), sided(y)) match {
        case (Some((xb, xo, xIsLeft)), Some((yb, yo, yIsLeft))) if xIsLeft != yIsLeft =>
          // x > y (or >=): if x is right → d > yo - xo (lower); else d < xo - yo (upper)
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
      case GreaterThan(a, b)        => mk(a, b, orEqual = false)
      case GreaterThanOrEqual(a, b) => mk(a, b, orEqual = true)
      case LessThan(a, b)           => mk(b, a, orEqual = false)
      case LessThanOrEqual(a, b)    => mk(b, a, orEqual = true)
      case _ => None
    }
  }

  private final case class Band(lBase: Expression, rBase: Expression, lo: Long, hi: Long)

  /** Find one (expression pair, [lo, hi]) band among the conjuncts. */
  private def detect(conjuncts: Seq[Expression], left: LogicalPlan, right: LogicalPlan): Option[Band] = {
    val bounds = conjuncts.flatMap(c => asBound(c, left.outputSet, right.outputSet))
    val grouped = bounds.groupBy(b => (b.lBase.canonicalized, b.rBase.canonicalized))
    grouped.values.collectFirst {
      case bs if bs.exists(_.lo.isDefined) && bs.exists(_.hi.isDefined) &&
          bs.flatMap(_.lo).max <= bs.flatMap(_.hi).min =>
        Band(bs.head.lBase, bs.head.rBase, bs.flatMap(_.lo).max, bs.flatMap(_.hi).min)
    }
  }

  /** Conf key for the size guard's byte half; -1 disables the guard. */
  val SmallRightBytesKey = "spark.graft.rangeJoinRewrite.smallRightBytes"

  /** Conf key for the size guard's row half; -1 lets bytes alone decide. */
  val SmallRightRowsKey = "spark.graft.rangeJoinRewrite.smallRightRows"

  /** Default row ceiling for "small": a broadcast NLJ does this many
    * comparisons per left row, so past it the bucketed shuffle wins. */
  val DefaultSmallRightRows = 65536L

  // Batch only: a stream-stream interval join's range condition is what
  // BOUNDS its buffered state (watermark eviction) — bucketing it away
  // would break state cleanup, and Generate/Window aren't streamable in
  // that position anyway.
  private def eligible(j: Join): Boolean =
    j.getTagValue(rewritten).isEmpty &&
      !j.isStreaming &&
      !j.output.exists(a => a.name.startsWith(BucketCol) || a.name.startsWith("__bkt")) &&
      j.resolved &&
      !sideBroadcastable(guardSide(j))

  /** Which side's smallness lets the STOCK planner handle the join
    * well (the size guard's subject). For every join type but
    * RightOuter that is the right side — Spark's BroadcastHashJoin /
    * BroadcastNestedLoopJoin build RIGHT for Inner, LeftOuter,
    * LeftSemi/Anti (and the FullOuter branch keeps the historical
    * right-side guard: neither side is broadcastable for a stock full
    * outer, so any guard only ever declines work). A RIGHT OUTER join
    * preserves the right side, so stock Spark can only build/broadcast
    * the LEFT — a small right side does NOT save the stock plan from
    * its quadratic nested loop, and must not suppress the rewrite. */
  private def guardSide(j: Join): LogicalPlan = j.joinType match {
    case RightOuter => j.left
    case _          => j.right
  }

  /** Parse a long-valued conf; a malformed value must not throw from
    * inside the optimizer (it would fail every query in the session),
    * so it logs and falls back to the default. */
  private def confLong(key: String, default: Long): Long = {
    val raw = conf.getConfString(key, default.toString)
    try raw.trim.toLong
    catch {
      case _: NumberFormatException =>
        logWarning(s"Ignoring malformed $key='$raw'; using default $default")
        default
    }
  }

  /** True when `side` is small enough — in bytes AND estimated rows —
    * that Spark's stock broadcast join (hash or nested-loop) is the
    * better plan; see the size-guard paragraph in the class doc and
    * [[guardSide]] for which side that is per join type. */
  private def sideBroadcastable(side: LogicalPlan): Boolean = {
    val bytesThr = confLong(SmallRightBytesKey, conf.autoBroadcastJoinThreshold)
    val stats = side.stats
    if (bytesThr < 0 || stats.sizeInBytes > BigInt(bytesThr)) return false
    val rowsThr = confLong(SmallRightRowsKey, DefaultSmallRightRows)
    if (rowsThr < 0) return true // row half disabled: bytes alone decide
    // rowCount stats when available; else bytes over the schema's width.
    // For file relations sizeInBytes is the COMPRESSED on-disk size
    // while defaultSize is the uncompressed in-memory width, so the
    // quotient can undercount rows several-fold — the width is
    // discounted by a columnar-typical 4x so the estimate errs HIGH:
    // an overestimate merely declines broadcastable-sized sides the
    // stock planner handles anyway, while an undercount would wave a
    // genuinely row-heavy side into a broadcast nested-loop join.
    val rowWidth = math.max(1L, (side.output.map(_.dataType.defaultSize.toLong).sum + 8L) / 4L)
    stats.rowCount.getOrElse(stats.sizeInBytes / rowWidth) <= BigInt(rowsThr)
  }

  /** Stage retries recompute lost partitions; an id-keyed copy
    * resolution is only exact when recomputation reproduces the rows
    * (see the LeftOuter paragraph in the class doc). */
  private def deterministicSubtree(p: LogicalPlan): Boolean =
    p.find(n => n.expressions.exists(!_.deterministic)).isEmpty

  // Exact floorDiv in Long space: subtract the positive modulus first so
  // the difference divides exactly (see graft.operators.RangeJoin).
  private def bucket(w: Long)(x: Expression): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

  /** Explode `child` (left side) to the ≤ 2 candidate buckets of `band`,
    * appending bucket attribute `bktL`. */
  private def explodeLeft(child: LogicalPlan, band: Band, bktL: AttributeReference): Generate = {
    val w = band.hi - band.lo + 1
    val arr = ArrayDistinct(CreateArray(Seq(
      bucket(w)(Add(band.lBase, Literal(band.lo))), bucket(w)(Add(band.lBase, Literal(band.hi))))))
    Generate(Explode(arr), Nil, outer = false, None, Seq(bktL), child)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) if eligible(j) =>
      val conjuncts = splitConjunctivePredicates(cond)
      detect(conjuncts, left, right) match {
        case None => j
        case Some(band) =>
          val w = band.hi - band.lo + 1
          val bktL = AttributeReference(BucketCol + "_l", LongType)()
          val lGen = explodeLeft(left, band, bktL)
          val rAlias = Alias(bucket(w)(band.rBase), BucketCol + "_r")()
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

    case j @ Join(left, right, jt @ (LeftSemi | LeftAnti), Some(cond), hint) if eligible(j) =>
      detect(splitConjunctivePredicates(cond), left, right) match {
        case None => j
        case Some(band) => rewriteExistence(left, right, jt, cond, hint, band)
      }

    case j @ Join(left, right, LeftOuter, Some(cond), hint)
        if eligible(j) && deterministicSubtree(left) =>
      detect(splitConjunctivePredicates(cond), left, right) match {
        case None => j
        case Some(band) => rewriteLeftOuter(left, right, cond, hint, band)
      }

    case j @ Join(left, right, RightOuter, Some(cond), hint)
        if eligible(j) && deterministicSubtree(right) =>
      // RIGHT OUTER is the LeftOuter construction with the sides
      // swapped and the band mirrored — rBase-lBase ∈ [lo,hi] is
      // lBase-rBase ∈ [-hi,-lo] from the right side's point of view.
      // The uid now rides the (preserved) RIGHT side, so that is the
      // subtree that must be deterministic; the user's per-side hints
      // swap with the sides, and a final projection restores the
      // original column order with the left side nullable.
      detect(splitConjunctivePredicates(cond), left, right) match {
        case None => j
        case Some(band) =>
          val mirrored = Band(band.rBase, band.lBase, -band.hi, -band.lo)
          val mirroredHint = JoinHint(hint.rightHint, hint.leftHint)
          val swapped = rewriteLeftOuter(right, left, cond, mirroredHint, mirrored)
          // rewriteLeftOuter output order is (right.output, left.output
          // nullable); restore the join's own (left nullable, right)
          Project(left.output.map(_.withNullability(true)) ++ right.output, swapped)
      }

    case j @ Join(left, right, FullOuter, Some(cond), hint)
        if eligible(j) && deterministicSubtree(left) && deterministicSubtree(right) =>
      // FULL OUTER = LEFT OUTER ∪ the right rows that matched nothing,
      // composed from the two proven constructions rather than one
      // full-outer join over the exploded left: there, every unmatched
      // RIGHT row would surface with a null uid and the copy-resolution
      // window would funnel ALL of them into the single uid-null
      // partition — a skew bomb precisely when the join is sparse. The
      // union costs a second (linear, bucketed) pass instead. Both
      // subtrees are evaluated twice, so both must be deterministic —
      // a nondeterministic side could disagree between the branches,
      // duplicating or dropping rows.
      detect(splitConjunctivePredicates(cond), left, right) match {
        case None => j
        case Some(band) =>
          val matchedPlusLeft = rewriteLeftOuter(left, right, cond, hint, band)
          // right rows with no partner: anti-join right against left
          // under the mirrored band — rBase-lBase ∈ [lo,hi] is
          // lBase-rBase ∈ [-hi,-lo] with the sides swapped
          val mirrored = Band(band.rBase, band.lBase, -band.hi, -band.lo)
          // the anti branch swaps the sides, so the user's per-side
          // hints must swap with them
          val mirroredHint = JoinHint(hint.rightHint, hint.leftHint)
          val unmatchedRight =
            rewriteExistence(right, left, LeftAnti, cond, mirroredHint, mirrored)
          val rightWithNullLeft = Project(
            left.output.map(a => Alias(Literal(null, a.dataType), a.name)()) ++ right.output,
            unmatchedRight)
          // positional UNION ALL; output attribute ids come from the
          // head child, which carries the original left/right ids
          Union(Seq(matchedPlusLeft, rightWithNullLeft))
      }
  }

  /** The semi/anti existence construction (see the class doc): left
    * keeps its single bucket, right explodes to the ≤ 2 buckets a
    * matching left row could occupy, the whole original condition rides
    * the ON clause. Output: `left.output`. */
  private def rewriteExistence(
      left: LogicalPlan,
      right: LogicalPlan,
      jt: JoinType,
      cond: Expression,
      hint: JoinHint,
      band: Band): LogicalPlan = {
    val w = band.hi - band.lo + 1
    val lBkt = Alias(bucket(w)(band.lBase), BucketCol + "_l")()
    val lProj = Project(left.output :+ lBkt, left)
    val bktR = AttributeReference(BucketCol + "_r", LongType)()
    val arr = ArrayDistinct(CreateArray(Seq(
      bucket(w)(Subtract(band.rBase, Literal(band.hi))),
      bucket(w)(Subtract(band.rBase, Literal(band.lo))))))
    val rGen = Generate(Explode(arr), Nil, outer = false, None, Seq(bktR), right)
    // existence test: the whole original condition rides the ON
    // clause; Spark's planner extracts its equi conjuncts (if any)
    // as hash keys alongside the bucket equality
    val joinCond = And(EqualTo(lBkt.toAttribute, bktR), cond)
    val newJoin = Join(lProj, rGen, jt, Some(joinCond), hint)
    newJoin.setTagValue(rewritten, true)
    Project(left.output, newJoin)
  }

  /** The LEFT OUTER construction (see the class doc): uid-tagged
    * exploded left, LEFT OUTER bucketed join with the full condition in
    * the ON clause, windowed copy resolution. Output:
    * `left.output ++ right.output` (right side nullable). */
  private def rewriteLeftOuter(
      left: LogicalPlan,
      right: LogicalPlan,
      cond: Expression,
      hint: JoinHint,
      band: Band): LogicalPlan = {
    // per-execution row id: groups the ≤ 2 bucket copies of one
    // left row back together (and keeps duplicate left rows apart)
    val uid = Alias(MonotonicallyIncreasingID(), "__graft_uid")()
    val lTagged = Project(left.output :+ uid, left)
    val uidRef = uid.toAttribute
    val bktL = AttributeReference(BucketCol + "_l", LongType)()
    val lGen = explodeLeft(lTagged, band, bktL)

    val w = band.hi - band.lo + 1
    val rBkt = Alias(bucket(w)(band.rBase), BucketCol + "_r")()
    val marker = Alias(Literal(true), BucketCol + "_m")()
    val rProj = Project(right.output :+ rBkt :+ marker, right)

    // LEFT OUTER: the entire original condition must live in the
    // ON clause (filtering afterwards would turn it inner)
    val joinCond = And(EqualTo(bktL, rBkt.toAttribute), cond)
    val newJoin = Join(lGen, rProj, LeftOuter, Some(joinCond), hint)
    newJoin.setTagValue(rewritten, true)

    // copy resolution: count matches per uid; null rows survive
    // only when the uid matched nowhere, and then exactly once
    val mRef = marker.toAttribute.withNullability(true)
    val order = Seq(SortOrder(mRef, Ascending))
    val cnt = Alias(
      WindowExpression(
        AggregateExpression(Count(Seq(mRef)), Complete, isDistinct = false),
        WindowSpecDefinition(Seq(uidRef), order,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing))),
      BucketCol + "_cnt")()
    val rn = Alias(
      WindowExpression(
        RowNumber(),
        WindowSpecDefinition(Seq(uidRef), order,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
      BucketCol + "_rn")()
    val win = Window(Seq(cnt, rn), Seq(uidRef), order, newJoin, None)
    val keep = Or(
      IsNotNull(mRef),
      And(EqualTo(cnt.toAttribute, Literal(0L)), EqualTo(rn.toAttribute, Literal(1))))
    Project(left.output ++ right.output.map(_.withNullability(true)), Filter(keep, win))
  }
}
