package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two samples of a binned
  * feature — the monitoring primitive a training-data pipeline runs
  * between ingestion batches ("did this source's quality distribution
  * shift?"). PSI is the industry habit, but its ln(p/q) term hinges on
  * libm rounding; the two metrics here carry the same signal with
  * engine-exact arithmetic:
  *
  *  - total variation distance, TV = ½·Σᵢ|pᵢ − qᵢ|. Computed as the
  *    INTEGER sum Σ|aᵢ·N_b − bᵢ·N_a| (order-insensitive, exact) with
  *    one final division — never a float accumulation whose order
  *    could differ across engines/partitionings.
  *  - the two-sample chi-square statistic,
  *    χ² = N·Σᵢ (aᵢ·N_b − bᵢ·N_a)² / (N_a·N_b·(aᵢ+bᵢ)). Per-bin terms
  *    are quantized to integer micro-units BEFORE the sum, so the sum
  *    is again order-free.
  *
  * One aggregation tree: groupBy(group, bin) with conditional counts,
  * a per-group totals join, one final groupBy(group). Everything
  * shuffles on the group key; bins bound the state.
  */
object Drift {

  /** @param inA boolean column marking sample A's rows (false = B).
    * Output per `groupCol`: `na`, `nb` (sample sizes), `tv_bp` (total
    * variation in basis points), `chi2_micro` (χ² in micro-units). */
  def histogramDrift(df: DataFrame, groupCol: String, binCol: String,
      inA: Column): DataFrame =
    driftFromCounts(
      df.groupBy(col(groupCol), col(binCol).as("bin"))
        .agg(
          sum(when(inA, 1L).otherwise(0L)).as("a"),
          sum(when(inA, 0L).otherwise(1L)).as("b")),
      groupCol)

  /** The metric over pre-aggregated per-(group, bin) counts `a`/`b` —
    * bin counts are ADDITIVE partials, so this is also the read side
    * of the streaming twin ([[graft.streaming.StreamingDrift]]):
    * accumulate increments, sum per bin, compare. Adds the
    * Kolmogorov–Smirnov statistic (`ks_bp`): over bins in their
    * natural order, KS = max|F_a − F_b| = max|Σ_{≤i} dⱼ| / (N_a·N_b)
    * — the running sum of the SAME integer numerators, so it too is
    * exact until one final division. */
  def driftFromCounts(bins: DataFrame, groupCol: String): DataFrame = {
    val totals = bins.groupBy(col(groupCol))
      .agg(sum("a").as("na"), sum("b").as("nb"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("bin"))
      .rowsBetween(Long.MinValue, 0)
    bins.join(totals, groupCol)
      .withColumn("__d", col("a") * col("nb") - col("b") * col("na"))
      .withColumn("__tv_term", abs(col("__d")))
      .withColumn("__ks_term", abs(sum(col("__d")).over(wCum)))
      .withColumn("__chi_term",
        // per-bin quantization keeps the later sum order-insensitive
        round(lit(1000000.0) * (col("na") + col("nb")) * col("__d") * col("__d") /
          (col("na") * col("nb") * (col("a") + col("b")))).cast("long"))
      .groupBy(col(groupCol), col("na"), col("nb"))
      .agg(sum("__tv_term").as("__tv_sum"),
        max("__ks_term").as("__ks_max"),
        sum("__chi_term").as("chi2_micro"))
      .select(col(groupCol), col("na"), col("nb"),
        round(lit(10000.0) * col("__tv_sum") /
          (lit(2.0) * col("na") * col("nb"))).cast("long").as("tv_bp"),
        round(lit(10000.0) * col("__ks_max") /
          (lit(1.0) * col("na") * col("nb"))).cast("long").as("ks_bp"),
        col("chi2_micro"))
  }
}
