package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule automating [[graft.ops.RangeJoin.bandedIntervalJoin]]:
  * an inner join whose WHOLE condition is point-in-interval containment
  * (`p >= lo AND p <= hi`, i.e. `p BETWEEN lo AND hi`) has no equi key,
  * so Spark plans a BroadcastNestedLoopJoin or cartesian — the all-pairs
  * shape that dies at scale. This rule rewrites the LOGICAL join into
  * the banding form — explode the interval side across fixed-width
  * buckets, band the point side, equi-join on the bucket, keep the
  * exact predicate — so the planner sees an equi-join and picks a
  * hash/sort-merge strategy.
  *
  * Scope is deliberately tight (the caller opts in per session):
  *  - fires only when `spark.graft.rangeJoin.bandWidth` is set > 0
  *    (the bucket width, in the column's units);
  *  - inner joins whose condition is EXACTLY the two containment
  *    conjuncts, all three operands LongType, point side and interval
  *    side each referencing exactly one join child (either way round);
  *  - inverted intervals (`hi < lo`) match nothing in the original
  *    BNLJ, and the pre-explode `lo <= hi` filter preserves that.
  *
  * The rewritten join's condition gains an equality conjunct, so the
  * pattern can never re-fire on its own output. Registration:
  * `GraftExtensions` injects it at session build; for a live session,
  * `GraftExtensions.register` appends it to
  * `spark.experimental.extraOptimizations`.
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  val bandWidthConf = "spark.graft.rangeJoin.bandWidth"

  /** Fan-out ceiling per interval, mirroring
    * [[graft.ops.RangeJoin.bandedIntervalJoin]]'s default. */
  val maxBandsPerInterval: Long = 1L << 22

  private def bandWidth: Option[Long] =
    Option(spark.conf.get(bandWidthConf, null))
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .filter(_ > 0)

  /** (point, lo, hi) candidates when the condition is exactly the
    * containment pair. `p <= x` is ambiguous in isolation (is p the
    * point below its upper bound, or the lower bound of another
    * point?), so candidates anchor on the expression SHARED by both
    * conjuncts; the caller disambiguates by which join child each side
    * references. */
  private def containment(cond: Expression): Seq[(Expression, Expression, Expression)] = {
    def lower(e: Expression, p: Expression): Option[Expression] = e match {
      case GreaterThanOrEqual(a, lo) if a.semanticEquals(p) => Some(lo) // p >= lo
      case LessThanOrEqual(lo, a) if a.semanticEquals(p) => Some(lo)   // lo <= p
      case _ => None
    }
    def upper(e: Expression, p: Expression): Option[Expression] = e match {
      case LessThanOrEqual(a, hi) if a.semanticEquals(p) => Some(hi)   // p <= hi
      case GreaterThanOrEqual(hi, a) if a.semanticEquals(p) => Some(hi) // hi >= p
      case _ => None
    }
    def operands(e: Expression): Seq[Expression] = e match {
      case GreaterThanOrEqual(a, b) => Seq(a, b)
      case LessThanOrEqual(a, b) => Seq(a, b)
      case _ => Nil
    }
    cond match {
      case And(c1, c2) =>
        for {
          p <- operands(c1)
          (lo, hi) <- Seq(
            lower(c1, p).zip(upper(c2, p)),
            lower(c2, p).zip(upper(c1, p))).flatten
          if Seq(p, lo, hi).forall(_.dataType == LongType)
        } yield (p, lo, hi)
      case _ => Nil
    }
  }

  /** Exact band index at any magnitude: (e − pmod(e, w)) is a multiple
    * of w, so the integral divide never truncates. */
  private def bandOf(e: Expression, w: Long): Expression = {
    val wl = Literal(w, LongType)
    IntegralDivide(Subtract(e, Pmod(e, wl)), wl)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = bandWidth match {
    case None => plan
    case Some(w) => plan.transformUp {
      // IDEMPOTENT: a rewritten join keeps the original containment
      // conjuncts (bucket equality is only the candidate filter), so a
      // second application of this rule — sessions can carry it via
      // BOTH the builder hook and a live register() — would band the
      // banded join again (correct but bands² explode). The marker
      // attributes identify our own output.
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !cond.references.exists(a =>
            a.name == "__pt_band" || a.name == "__iv_band") =>
        // point from the left child, interval from the right — or
        // mirrored; rewrite keeps the ORIGINAL child order and output.
        // A point must reference SOMETHING (a constant "point" has no
        // side, and nothing to gain from banding).
        val candidates = containment(cond)
        candidates.collectFirst {
          case (p, lo, hi)
              if p.references.nonEmpty &&
                p.references.subsetOf(left.outputSet) &&
                (lo.references ++ hi.references).subsetOf(right.outputSet) =>
            rewrite(j, left, right, p, lo, hi, w, pointIsLeft = true, hint)
          case (p, lo, hi)
              if p.references.nonEmpty &&
                p.references.subsetOf(right.outputSet) &&
                (lo.references ++ hi.references).subsetOf(left.outputSet) =>
            rewrite(j, right, left, p, lo, hi, w, pointIsLeft = false, hint)
        }.getOrElse(j)
    }
  }

  private def rewrite(j: Join, pointSide: LogicalPlan, intervalSide: LogicalPlan,
      p: Expression, lo: Expression, hi: Expression, w: Long,
      pointIsLeft: Boolean, hint: JoinHint): LogicalPlan = {
    val ptBand = Alias(bandOf(p, w), "__pt_band")()
    val banded = Project(pointSide.output :+ ptBand, pointSide)

    val ivBand = AttributeReference("__iv_band", LongType, nullable = false)()
    // Sequence is TimeZoneAwareExpression: without an explicit zone it
    // reports unresolved (the analyzer's ResolveTimeZone has already
    // run), even though integral sequences never consult it
    val seq = Sequence(bandOf(lo, w), bandOf(hi, w),
      Some(Literal(1L, LongType)),
      Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    // Same fan-out guard as RangeJoin.bandedIntervalJoin: one corrupt
    // wide interval (hi = MAX_VALUE sentinel) or a too-fine bandWidth
    // would otherwise multiply the interval side by (hi-lo)/w rows and
    // fail only with sequence's anonymous array-length error. The guard
    // lives INSIDE the consumed expression so it cannot be pruned; the
    // error branch casts NullType to the sequence type to keep the
    // optimizer-built CaseWhen well-typed.
    val nBands = Subtract(bandOf(hi, w), bandOf(lo, w))
    val err = Cast(
      new RaiseError(Concat(Seq(
        Literal(s"RangeJoinRewrite: interval spans more than " +
          s"$maxBandsPerInterval bands at $bandWidthConf=$w (lo band "),
        Cast(bandOf(lo, w), org.apache.spark.sql.types.StringType),
        Literal(", hi band "),
        Cast(bandOf(hi, w), org.apache.spark.sql.types.StringType),
        Literal("); split the interval or coarsen the band width")))),
      seq.dataType)
    val guarded = CaseWhen(
      Seq((LessThan(nBands, Literal(maxBandsPerInterval, LongType)), seq)), Some(err))
    val exploded = Generate(
      Explode(guarded), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(ivBand),
      Filter(LessThanOrEqual(lo, hi), intervalSide))

    val equi = EqualTo(ptBand.toAttribute, ivBand)
    val (l, r) =
      if (pointIsLeft) (banded: LogicalPlan, exploded: LogicalPlan)
      else (exploded: LogicalPlan, banded: LogicalPlan)
    // keep the exact containment predicate: bucket equality is only the
    // candidate filter
    val joined = Join(l, r, Inner,
      Some(And(equi, j.condition.get)), hint)
    Project(j.output, joined)
  }
}
