package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without an equi key — an operator
  * Spark lacks natively: a raw `p.ts BETWEEN i.lo AND i.hi` join plans
  * as BroadcastNestedLoopJoin (or a cartesian), the all-pairs shape
  * `PlanAuditSpec` bans. The classic banding rewrite makes it an
  * EQUI-join: split the domain into fixed `bandWidth` buckets, explode
  * each interval across every bucket it overlaps, map each point to
  * exactly ONE bucket, join on the bucket, then apply the exact
  * containment predicate. A (point, interval) pair can only meet in the
  * point's single bucket, so the join emits no duplicates — no distinct
  * pass needed.
  *
  * Scale: one shuffle each side on the bucket key; the interval side
  * fans out by its bucket span (`len/bandWidth + 1` rows per interval).
  * `bandWidth` is the knob — around the typical interval length keeps
  * fan-out ≈ 2 while bounding how many intervals land in one bucket. A
  * degenerate interval spanning the whole domain fans out
  * `domain/bandWidth` rows: split such hot intervals or coarsen the
  * band; for dim-sized interval tables plain `broadcast()` + theta
  * filter is the cheaper plan.
  */
object RangeJoin {

  /** Exact integer floor-division (Spark's `div` truncates toward zero
    * and `/` goes through doubles, which lose ulps past 2^53 — epoch
    * micros are ~2^50.6 and climbing). `x - pmod(x, w)` is exactly
    * divisible, so the decimal divide is exact at any magnitude. */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")

  /** Join `points` (a `ptCol` long, e.g. epoch micros) to every row of
    * `intervals` whose `[loCol, hiCol]` (inclusive) contains it.
    * Empty/inverted intervals (`hi < lo`) match nothing and are
    * dropped before the explode (`sequence` would count DOWN through
    * them, fabricating buckets). An interval spanning more than
    * `maxBandsPerInterval` buckets fails the job with a row-identifying
    * error instead of silently allocating a giant per-row array (a
    * corrupt hi = MAX_VALUE sentinel would otherwise kill the stage
    * with sequence's anonymous array-length error, or OOM below it).
    * Output: point columns then interval columns, one row per
    * containing pair. */
  def bandedIntervalJoin(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String,
      bandWidth: Long, maxBandsPerInterval: Long = 1L << 22): DataFrame = {
    require(bandWidth > 0, s"need bandWidth > 0, got $bandWidth")
    require(maxBandsPerInterval > 0,
      s"need maxBandsPerInterval > 0, got $maxBandsPerInterval")
    val p = points.withColumn("__pt_band", floorDiv(col(ptCol), bandWidth))
    val i = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__lo_band", floorDiv(col(loCol), bandWidth))
      .withColumn("__hi_band", floorDiv(col(hiCol), bandWidth))
      // the guard lives INSIDE the consumed expression — a detached
      // assert_true column would be pruned as unused and never run
      .withColumn("__iv_band", explode(
        when(col("__hi_band") - col("__lo_band") < maxBandsPerInterval,
          sequence(col("__lo_band"), col("__hi_band")))
          .otherwise(raise_error(format_string(
            s"RangeJoin: interval [%s, %s] spans %s bands at bandWidth=$bandWidth " +
              s"(max $maxBandsPerInterval); split the interval or coarsen bandWidth",
            col(loCol), col(hiCol),
            col("__hi_band") - col("__lo_band") + 1)))))
    p.join(i, col("__pt_band") === col("__iv_band"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__pt_band", "__iv_band", "__lo_band", "__hi_band")
  }

  /** Interval × interval OVERLAP join (inclusive bounds): every pair
    * `(l, r)` with `l.lo <= r.hi && r.lo <= l.hi`, as an equi-join.
    * Both sides explode across their bucket span; a pair overlapping
    * across several shared buckets would meet in each one, so the join
    * keeps only the bucket equal to `greatest(l_lo_band, r_lo_band)` —
    * the FIRST bucket the pair can share — making the emit unique
    * without a distinct pass. Same fan-out economics and hot-interval
    * guard as [[bandedIntervalJoin]], paid on both sides.
    *
    * Output: left columns then right columns (caller disambiguates
    * shared names upstream). */
  def bandedOverlapJoin(left: DataFrame, right: DataFrame,
      lLoCol: String, lHiCol: String, rLoCol: String, rHiCol: String,
      bandWidth: Long, maxBandsPerInterval: Long = 1L << 22): DataFrame = {
    require(bandWidth > 0, s"need bandWidth > 0, got $bandWidth")
    require(maxBandsPerInterval > 0,
      s"need maxBandsPerInterval > 0, got $maxBandsPerInterval")
    def banded(df: DataFrame, loCol: String, hiCol: String,
        bandCol: String, loBandCol: String): DataFrame =
      df.filter(col(loCol) <= col(hiCol))
        .withColumn(loBandCol, floorDiv(col(loCol), bandWidth))
        .withColumn("__hi_band", floorDiv(col(hiCol), bandWidth))
        .withColumn(bandCol, explode(
          when(col("__hi_band") - col(loBandCol) < maxBandsPerInterval,
            sequence(col(loBandCol), col("__hi_band")))
            .otherwise(raise_error(format_string(
              s"RangeJoin: interval [%s, %s] spans %s bands at bandWidth=$bandWidth " +
                s"(max $maxBandsPerInterval); split the interval or coarsen bandWidth",
              col(loCol), col(hiCol),
              col("__hi_band") - col(loBandCol) + 1)))))
        .drop("__hi_band")
    val l = banded(left, lLoCol, lHiCol, "__l_band", "__l_lo_band")
    val r = banded(right, rLoCol, rHiCol, "__r_band", "__r_lo_band")
    l.join(r, col("__l_band") === col("__r_band"))
      // emit-once: of all shared buckets, only the first
      .filter(col("__l_band") === greatest(col("__l_lo_band"), col("__r_lo_band")))
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol))
      .drop("__l_band", "__r_band", "__l_lo_band", "__r_lo_band")
  }
}
