package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.DetHash

/** Deterministic weighted sampling without replacement via PRIORITY
  * SAMPLING (Duffield, Lund, Thorup 2007): item i gets priority
  * p_i = w_i / u_i with u_i uniform in (0,1]; the k highest priorities
  * are the sample, and with τ = the (k+1)-th priority, ŵ_i = max(w_i, τ)
  * is an unbiased estimator of any subset sum — the survey-sampling
  * workhorse for "sample 10k docs by quality weight, then estimate
  * corpus statistics from the sample".
  *
  * Design choices for engine-exact reproducibility:
  *  - u_i = (hash52(id)+1)/2^52 — [[DetHash.hash52]] is bit-identical
  *    in DuckDB, so the whole sample is oracle-checkable;
  *  - the priority is ONE multiply and ONE divide
  *    (w · 2^52 / (h+1)) — no pow/log whose libm rounding could
  *    diverge across engines (A-Res keys u^(1/w) would);
  *  - ties broken by id, so ordering is total.
  *
  * Scale: priorities are map-side; per-group top-(k+1) is one window
  * over the group shuffle (or use orderBy.limit for a global sample —
  * an ungrouped window would single-partition). Estimation never needs
  * the unsampled rows again: τ travels with the sample.
  */
object PrioritySample {

  private val Space = 4503599627370496.0 // 2^52

  /** Priority column: w · 2^52 / (hash52(id)+1). `id` must be a string
    * column (cast numerics first — the hash feeds md5 over the string
    * form, matching the DuckDB twin). Weights must be > 0. */
  def priority(id: Column, weight: Column): Column =
    weight * lit(Space) / (DetHash.hash52(id) + lit(1L))

  /** Per-group top-(k+1) candidate rows with their priorities — the
    * MERGEABLE partial: the global top-(k+1) of a union is contained
    * in the union of per-part top-(k+1)s, so per-batch/per-partition
    * candidates re-finish to exactly the whole-data sample
    * ([[graft.streaming.StreamingPrioritySample]] is this pattern over
    * micro-batches). Keeps the `__p` column for the finisher. */
  def candidates(df: DataFrame, idCol: String, weightCol: String,
      k: Int, groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__p").desc, col(idCol))
    df.withColumn("__p", priority(col(idCol).cast("string"), col(weightCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k + 1)
      .drop("__rn")
  }

  /** Finish a candidate frame (rows carrying `__p`): rank, cut at k,
    * attach `w_est = max(w, τ)` with τ = the (k+1)-th priority. */
  def finishSample(cands: DataFrame, idCol: String, weightCol: String,
      k: Int, groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    val w = Window.partitionBy(gs: _*)
      .orderBy(col("__p").desc, col(idCol))
    val ranked = cands.withColumn("rn", row_number().over(w))
    val tau = ranked.filter(col("rn") === k + 1)
      .select(gs :+ col("__p").as("__tau"): _*)
    ranked.filter(col("rn") <= k)
      .join(tau, groupCols, "left")
      .withColumn("w_est",
        when(col("__tau").isNull, col(weightCol))
          .otherwise(greatest(col(weightCol), col("__tau"))))
      .drop("__p", "__tau")
  }

  /** Per-group weighted sample of size k with estimation weights:
    * keeps each group's k highest-priority rows and attaches
    * `w_est = max(w, τ)` (τ = the group's (k+1)-th priority; groups
    * smaller than k+1 are exhaustive ⇒ ŵ = w exactly). Output adds
    * `rn` (1-based priority rank) and `w_est`. */
  def sampleByGroup(df: DataFrame, idCol: String, weightCol: String,
      k: Int, groupCols: Seq[String]): DataFrame =
    finishSample(candidates(df, idCol, weightCol, k, groupCols),
      idCol, weightCol, k, groupCols)

  /** Global (ungrouped) weighted sample: candidates come from
    * `orderBy.limit(k+1)` — TakeOrdered, a distributed per-partition
    * top-k — NOT from an ungrouped window, which would drag the whole
    * input through one partition. The ≤ k+1 survivors then finish
    * under a constant group. */
  def sample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val cands = df
      .withColumn("__p", priority(col(idCol).cast("string"), col(weightCol)))
      .orderBy(col("__p").desc, col(idCol))
      .limit(k + 1)
      .withColumn("__g", lit(1))
    finishSample(cands, idCol, weightCol, k, Seq("__g")).drop("__g")
  }
}
