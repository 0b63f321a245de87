package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable fixed-bin histogram quantile sketch — the percentile
  * member of the mergeable-sketch family next to HLL distincts
  * ([[ApproxDistinct]]) and bloom membership ([[BloomPrune]]).
  *
  * Exact per-group quantiles need every row shuffled and sorted per
  * group; the sketch reduces each increment to at most `nBins` counters
  * per group that merge by ADDITION (associative + commutative — the
  * same partial→final contract as the reference's accumulate_stats),
  * then answers any quantile from the cumulative histogram with error
  * bounded by one bin width `(hi - lo) / nBins`, chosen up front.
  *
  * Unlike `percentile_approx` (whose internal QuantileSummaries state
  * is not exposed), the partials are a plain DataFrame: write them to
  * parquet per day, merge across days, estimate at read time — the
  * incremental pattern [[ApproxDistinct]] uses for distinct counts.
  * Every step is deterministic integer/double arithmetic, so a DuckDB
  * oracle reproduces the sketch AND the estimates exactly (q71) —
  * no rows-only weak check.
  */
object QuantileSketch {

  /** Per-(keys, bin) counts — the sketch's public schema
    * (`keys..., bin, bin_count`, what gets persisted per increment).
    * Bin i covers `[lo + i*w, lo + (i+1)*w)` with `w = (hi-lo)/nBins`;
    * values outside [lo, hi) clamp into the edge bins (their mass is
    * counted, their position saturates — pick bounds from domain
    * knowledge or a prior pass). NULLs and NaNs are excluded: a NaN
    * has no defensible bin ((long)NaN is 0, which would drag LOW
    * quantiles down for a value every ordering treats as +∞). One
    * aggregation: map-side partials make the shuffle ≤ nBins rows per
    * group. */
  def sketchPartials(df: DataFrame, keys: Seq[String], valueCol: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    requireParams(keys, lo, hi, nBins)
    val w = (hi - lo) / nBins
    df.filter(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .withColumn("bin",
        least(greatest(floor((col(valueCol) - lo) / w), lit(0.0)),
          lit((nBins - 1).toDouble)).cast("long"))
      .groupBy(keys.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("bin_count"))
  }

  private def requireParams(keys: Seq[String], lo: Double, hi: Double,
      nBins: Int): Unit = {
    require(nBins > 0 && hi > lo, s"need nBins > 0, hi > lo; got $nBins [$lo, $hi)")
    val reserved = keys.toSet.intersect(Set("bin", "bin_count", "__cum", "__total"))
    require(reserved.isEmpty, s"key columns collide with sketch columns: $reserved")
  }

  /** Merge partial sketches (e.g. a union of per-day partials) by
    * summing counters — the additive A2 merge. */
  def merge(partials: DataFrame, keys: Seq[String]): DataFrame =
    partials.groupBy(keys.map(col) :+ col("bin"): _*)
      .agg(sum(col("bin_count")).as("bin_count"))

  /** Quantile estimates from partials: per group, the target rank
    * `t = q * total` lands in the unique bin with
    * `cum_before < t <= cum`; linear interpolation inside it gives
    * `lo + (bin + (t - cum_before) / bin_count) * w` (full precision —
    * round at the presentation layer like every other op here).
    *
    * Partials are [[merge]]d first, so a raw union of increments is
    * safe input: duplicate (keys, bin) rows would otherwise make the
    * cumulative window's tie order — and the estimates —
    * nondeterministic. The merge, window, and final groupBy all
    * partition on `keys`, so Spark plans ONE exchange for all three.
    * `qs` maps output column name → quantile in (0, 1]. */
  def estimate(partials: DataFrame, keys: Seq[String],
      lo: Double, hi: Double, nBins: Int,
      qs: Seq[(String, Double)]): DataFrame = {
    requireParams(keys, lo, hi, nBins)
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0 && q <= 1 },
      s"quantiles must be in (0, 1]: $qs")
    val w = (hi - lo) / nBins
    val byKey = Window.partitionBy(keys.map(col): _*)
    val cumW = byKey.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merge(partials, keys)
      .withColumn("__cum", sum("bin_count").over(cumW))
      .withColumn("__total", sum("bin_count").over(byKey))
    val aggs = qs.map { case (name, q) =>
      val t = col("__total") * q
      val before = col("__cum") - col("bin_count")
      min(when(before < t && col("__cum") >= t,
        lit(lo) + (col("bin") + (t - before) / col("bin_count")) * w))
        .as(name)
    }
    cum.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
