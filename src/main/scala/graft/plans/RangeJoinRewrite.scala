package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite an inner join whose only cross-side predicates
  * are a band-containment pair (`v >= lo AND v < hi` in any open/closed
  * variant, value on one side, bounds on the other) into the chunk-quantized
  * equi-join of [[graft.operators.RangeJoin]] — automatically.
  *
  * Without the rule, Spark plans such a join as a broadcast nested loop (no
  * equi keys) — quadratic at scale. With it, each interval side is exploded
  * to the fixed-width chunks it overlaps, the point side is keyed by its one
  * chunk, and the planner gets an ordinary equi-join (broadcast or shuffle
  * hash) with the original predicate kept as a residual filter — same rows,
  * linear shuffle. This is the `SparkSessionExtensions` tool used as the
  * prompt for this engine prescribes: a `Rule[LogicalPlan]` where built-in
  * planning genuinely can't produce the right shape.
  *
  * Opt-in: set `spark.graft.rangeJoin.chunkWidth` to a positive chunk width
  * (in value units; pick it near the median interval width). Off (0) by
  * default because the rewrite replicates each interval `width/chunkWidth`
  * times — the user knows the interval distribution, the optimizer doesn't.
  *
  * The guard requires NO cross-side equality conjunct, so the rewritten
  * join (which has one) can never re-match — the rule is a fixed point.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ChunkWidthConf = "spark.graft.rangeJoin.chunkWidth"

  private def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]

  /** (value, lowerBound, upperBound) when the conjuncts form a band probe of
    * `probe`'s value against `build`'s bounds.
    */
  private def bandOf(
      conjuncts: Seq[Expression],
      probe: LogicalPlan,
      build: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    val cross = conjuncts.filter(c =>
      !canEvaluate(c, probe) && !canEvaluate(c, build))
    if (cross.size != 2) return None
    def sides(e: Expression): Option[(Expression, Expression, Boolean)] = e match {
      // returns (value, bound, boundIsLower)
      case GreaterThanOrEqual(v, b) => Some((v, b, true))
      case GreaterThan(v, b) => Some((v, b, true))
      case LessThan(v, b) => Some((v, b, false))
      case LessThanOrEqual(v, b) => Some((v, b, false))
      case _ => None
    }
    // normalize bound-on-the-left comparisons (lo <= v) to value-first
    def normalized(e: Expression): Option[(Expression, Expression, Boolean)] =
      sides(e).flatMap { case (a, b, lower) =>
        if (canEvaluate(a, probe) && canEvaluate(b, build)) Some((a, b, lower))
        else if (canEvaluate(b, probe) && canEvaluate(a, build)) Some((b, a, !lower))
        else None
      }
    (normalized(cross(0)), normalized(cross(1))) match {
      case (Some((v1, lo, true)), Some((v2, hi, false))) if v1.semanticEquals(v2) && numeric(v1) && numeric(lo) && numeric(hi) =>
        Some((v1, lo, hi))
      case (Some((v1, hi, false)), Some((v2, lo, true))) if v1.semanticEquals(v2) && numeric(v1) && numeric(lo) && numeric(hi) =>
        Some((v1, lo, hi))
      case _ => None
    }
  }

  /** A cross-side equality means the planner already has an equi key — the
    * join is not nested-loop-bound and must not be rewritten (this is also
    * what makes the rule a fixed point). Same-side equalities don't count.
    */
  private def hasCrossEquality(conjuncts: Seq[Expression], l: LogicalPlan, r: LogicalPlan): Boolean =
    conjuncts.exists {
      case e @ (EqualTo(_, _) | EqualNullSafe(_, _)) =>
        !canEvaluate(e, l) && !canEvaluate(e, r)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString(ChunkWidthConf, "0")
    val width = try raw.toDouble catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$ChunkWidthConf must be a number (chunk width in value units), got '$raw'")
    }
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasCrossEquality(conjuncts, left, right)) j
        else {
          bandOf(conjuncts, probe = left, build = right)
            .map { case (v, lo, hi) => rewrite(j, v, lo, hi, pointsOnLeft = true, width) }
            .orElse(
              bandOf(conjuncts, probe = right, build = left)
                .map { case (v, lo, hi) => rewrite(j, v, lo, hi, pointsOnLeft = false, width) })
            .getOrElse(j)
        }
    }
  }

  private def chunkOf(e: Expression, width: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(width, DoubleType)))

  private def rewrite(
      j: Join,
      v: Expression,
      lo: Expression,
      hi: Expression,
      pointsOnLeft: Boolean,
      width: Double): LogicalPlan = {
    val (points, intervals) = if (pointsOnLeft) (j.left, j.right) else (j.right, j.left)
    val pChunk = Alias(chunkOf(v, width), "_graft_chunk_p")()
    val newPoints = Project(points.output :+ pChunk, points)
    // timeZoneId must be set explicitly: analysis (which normally fills it)
    // already ran, and a TimeZoneAwareExpression without one is unresolved
    val seq = Sequence(
      chunkOf(lo, width), chunkOf(hi, width), None, Some(conf.sessionLocalTimeZone))
    val genOut = AttributeReference("_graft_chunk_i", LongType, nullable = false)()
    val newIntervals = Generate(
      Explode(seq),
      unrequiredChildIndex = Nil,
      outer = false,
      qualifier = None,
      generatorOutput = Seq(genOut),
      child = intervals)
    val newCond = And(EqualTo(pChunk.toAttribute, genOut), j.condition.get)
    val (newLeft, newRight) =
      if (pointsOnLeft) (newPoints: LogicalPlan, newIntervals: LogicalPlan)
      else (newIntervals: LogicalPlan, newPoints: LogicalPlan)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}
