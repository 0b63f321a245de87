package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct counts via Datasketches HLL — the 100 TB
  * replacement for exact `count_distinct` in incremental pipelines.
  *
  * Exact distinct-day/participant counts (A3, `process-overview.py`'s
  * `unique_days`) don't MERGE: two partial exact counts can't be
  * combined without re-reading both inputs, so the reference's
  * partial-rewrite loop recomputes them from scratch every walk. HLL
  * sketches union losslessly: persist one binary sketch per group per
  * increment ([[sketchPartials]]), then [[mergeEstimate]] unions any set
  * of increments map-side — same shape as
  * [[graft.streaming.StreamingOverview]]'s count/min/max partials, now
  * covering the distinct-count column too.
  *
  * Error envelope at default lgConfigK=12: ±1.6% at one sigma (exact
  * while the sketch stays in sparse mode — small groups round-trip
  * exactly; `ApproxDistinctSpec` pins both regimes).
  */
object ApproxDistinct {

  /** One HLL sketch per group — the mergeable partial. Store next to
    * additive partials (counts/min/max) in the increment's parquet.
    * `lgConfigK` sizes the sketch: it stays EXACT while distincts fit
    * its set mode (≈ 2^(lgConfigK-2)), then estimates at ±~1.04/√2^lgK
    * — pick it from the expected per-group cardinality (the sketch is
    * 2^lgConfigK nibbles, so oversizing is cheap insurance). */
  def sketchPartials(df: DataFrame, keys: Seq[String], value: Column,
      sketchCol: String = "distinct_sketch", lgConfigK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(value, lit(lgConfigK)).as(sketchCol))

  /** Union partial sketches across increments and estimate the global
    * distinct count per group. */
  def mergeEstimate(partials: DataFrame, keys: Seq[String],
      sketchCol: String = "distinct_sketch",
      outCol: String = "distinct_est"): DataFrame =
    partials.groupBy(keys.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(sketchCol))).as(outCol))
}
