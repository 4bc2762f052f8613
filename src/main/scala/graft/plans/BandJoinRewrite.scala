package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DayTimeIntervalType,
  LongType, TimestampType}

/** Optimizer rule rewriting bounded time-range joins into band
  * (time-bin) equi-joins — the automatic form of
  * [[graft.operators.Temporal.boundedGapSelfJoin]]'s rewrite, applied
  * to joins the USER wrote naively:
  *
  * {{{
  * SELECT ... FROM a JOIN b
  * ON a.key = b.key AND b.ts >= a.ts
  *                  AND b.ts <= a.ts + INTERVAL 6 HOUR
  * }}}
  *
  * Spark plans the range conjuncts as a post-join filter, so the join
  * matches every (key)-equal pair across ALL time — quadratic in a hot
  * key's row count — and with no equi-conjunct at all it degenerates to
  * BroadcastNestedLoopJoin over the full cross product. The rewrite
  * adds the implied band key: rows within `gap` of each other sit in
  * the same or adjacent time bins of width `gap`, so probing bins
  * {bin(ta), bin(ta)+1} from the lower-bound side while the other side
  * keys on bin(tb) finds every qualifying pair through a pure
  * equi-join (2× probe duplication, never a cross product). The
  * original range conjuncts stay in the condition, so the rewrite is
  * semantics-preserving for ANY matched shape; the bin equality it
  * adds is implied by them.
  *
  * Matched pattern (inner joins): conjuncts `tb >= ta` and
  * `tb <= ta + g` (either comparison orientation; `between` expands to
  * exactly this) where ta/tb are timestamp expressions from opposite
  * join sides and g is a foldable day-time interval — or the same
  * shape on long (epoch-micros style) columns with a long-literal gap.
  * By default only joins WITHOUT another cross-side equi-key rewrite
  * (the cross-product case, an unconditional win); keyed joins rewrite
  * only under [[KeyedConf]] — see the measured tradeoff in SCALING.md.
  * Registered through [[graft.functions.GraftExtensions]]; runs inside
  * the fixed-point operator-optimization batch, so a marker attribute
  * prefix keeps it idempotent.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val binPrefix = "__graft_band_bin"

  /** `x >= y` normalized from either comparison orientation. */
  private object Ge {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(x, y) => Some((x, y))
      case LessThanOrEqual(y, x)    => Some((x, y))
      case _                        => None
    }
  }

  /** `x <= y + gapUs` normalized from either orientation, timestamp
    * (day-time interval literal) or long (long literal) flavor. */
  private object LeShift {
    def unapply(e: Expression): Option[(Expression, Expression, Long)] = {
      def shifted(s: Expression): Option[(Expression, Long)] = s match {
        case TimestampAddInterval(y,
            Literal(g: Long, _: DayTimeIntervalType), _) => Some((y, g))
        case Add(y, Literal(g: Long, LongType), _)       => Some((y, g))
        case Add(Literal(g: Long, LongType), y, _)       => Some((y, g))
        case _                                           => None
      }
      e match {
        case LessThanOrEqual(x, s)    => shifted(s).map { case (y, g) => (x, y, g) }
        case GreaterThanOrEqual(s, x) => shifted(s).map { case (y, g) => (x, y, g) }
        case _                        => None
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // streaming joins excluded: Spark's stream-stream interval join
    // already bounds state from the range predicate itself, and an
    // injected Generate would break watermark propagation
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !alreadyRewritten(j) && !j.isStreaming =>
      findBand(j, cond).map { case (ta, tb, gapUs) =>
        val taFromLeft = ta.references.subsetOf(left.outputSet)
        val (taPlan, tbPlan) = if (taFromLeft) (left, right) else (right, left)

        // floor(µs / gap) via (t - t mod gap) div gap: pmod is
        // non-negative, so the quotient is an exact floor for any sign
        val gl = Literal(gapUs, LongType)
        def micros(e: Expression): Expression =
          if (e.dataType == TimestampType) UnixMicros(e) else e
        def bin(e: Expression): Expression = {
          val um = micros(e)
          IntegralDivide(Subtract(um, Pmod(um, gl)), gl)
        }

        // probe (lower-bound) side: each row lands in its own bin and
        // the next — a pair within gap spans at most adjacent bins
        val binA = bin(ta)
        val arr = CreateArray(Seq(binA, Add(binA, Literal(1L))))
        val binP = AttributeReference(s"${binPrefix}_p", LongType,
          nullable = arr.dataType.asInstanceOf[ArrayType].containsNull)()
        val probe = Generate(Explode(arr), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(binP),
          child = taPlan)

        val binBAlias = Alias(bin(tb), s"${binPrefix}_b")()
        val build = Project(tbPlan.output :+ binBAlias, tbPlan)

        val newCond = And(cond, EqualTo(binP, binBAlias.toAttribute))
        val rewritten =
          if (taFromLeft) Join(probe, build, Inner, Some(newCond), hint)
          else Join(build, probe, Inner, Some(newCond), hint)
        // restore the original schema (the bin columns are internal)
        Project(j.output, rewritten)
      }.getOrElse(j)
  }

  private def alreadyRewritten(j: Join): Boolean =
    j.children.exists(_.output.exists(_.name.startsWith(binPrefix)))

  /** When true, the rewrite also fires on joins that ALREADY have an
    * equi-key. Default off: with a well-distributed key the band adds
    * an exchange and a 2× probe for little gain (measured ~25% slower
    * at ×10, SCALING.md); it pays off only on HOT keys, which the
    * optimizer cannot see without stats — so keyed rewriting is the
    * user's call. The keyless cross-product degeneration is an
    * unconditional win and always rewrites. */
  val KeyedConf = "spark.graft.bandJoinRewrite.keyed"

  /** Finds (ta, tb, gapUs): conjuncts `tb >= ta` and `tb <= ta + gap`
    * over deterministic expressions of matching flavor from opposite
    * join sides, with a positive gap. */
  private def findBand(j: Join,
      cond: Expression): Option[(Expression, Expression, Long)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def oneSided(e: Expression): Boolean =
      e.deterministic && e.references.nonEmpty &&
        (e.references.subsetOf(j.left.outputSet) ||
          e.references.subsetOf(j.right.outputSet))
    def opposite(a: Expression, b: Expression): Boolean =
      oneSided(a) && oneSided(b) &&
        (a.references.subsetOf(j.left.outputSet) !=
          b.references.subsetOf(j.left.outputSet))
    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b)       => opposite(a, b)
      case EqualNullSafe(a, b) => opposite(a, b)
      case _                   => false
    }
    val keyedEnabled = org.apache.spark.sql.internal.SQLConf.get
      .getConfString(KeyedConf, "false").toBoolean
    if (hasEquiKey && !keyedEnabled) return None
    def flavorOk(e: Expression): Boolean =
      e.dataType == TimestampType || e.dataType == LongType
    val lowers = conjuncts.collect {
      case Ge(x, y) if opposite(x, y) && flavorOk(x) &&
        x.dataType == y.dataType => (x, y)
    }
    val uppers = conjuncts.collect {
      case LeShift(x, y, g) if g > 0 && opposite(x, y) && flavorOk(x) &&
        x.dataType == y.dataType => (x, y, g)
    }
    (for {
      (tbL, taL) <- lowers.iterator
      (tbU, taU, g) <- uppers.iterator
      if tbL.semanticEquals(tbU) && taL.semanticEquals(taU)
    } yield (taL, tbL, g)).nextOption()
  }
}
