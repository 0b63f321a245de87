package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * When one join key is hot, every row carrying it lands on one reducer
  * and the stage runs at the speed of that task. AQE's skew-join split
  * handles this for sort-merge joins at runtime; SALTING is the
  * deterministic pre-split for the cases AQE can't rewrite (bucketed
  * inputs, aggregation-over-join pipelines, streaming micro-batches):
  * the large side scatters each key across `nSalts` sub-keys, the small
  * side is replicated `nSalts`× by an explode, and the join key becomes
  * (key, salt) — so a hot key's rows spread over `nSalts` reducers.
  *
  * Result equivalence to the unsalted join is exact: every large-side
  * row meets every matching small-side row in exactly one salt bucket
  * (its own), and the replicated small side covers all buckets.
  *
  * Measured on a Zipf(α≈1)-skewed clone (graft.SkewBench over
  * ScaleClone --zipf; table in SCALING.md): AQE's runtime split is
  * the cheapest mitigation whenever it applies (tight run-time band
  * where the naive join's runs scatter), while salting's cost grows
  * with the REPLICATED side — free when that side is small and fixed,
  * 2× the naive join at 30× data when it scales with the corpus. Salt
  * for the AQE-can't-rewrite cases above with a genuinely small
  * replicated side; never as the default.
  */
object Skew {

  /** The default salt: a hash of the row's VALUES only. Deterministic,
    * so it is safe under partial stage retries — a re-run map task
    * assigns every row the same salt the original run did, and reducers
    * that already fetched data stay consistent (the failure mode a
    * row-counter salt invites is the SPARK-23207 class: recomputed
    * counters diverge from the fetched data's, losing or duplicating
    * join rows). The trade: byte-identical duplicate rows hash to one
    * bucket. Any distinguishing payload column (an id, a timestamp, an
    * offset) restores the spread, which is the common case. */
  private[ops] def saltExpr(large: DataFrame, nSalts: Int): Column =
    pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(nSalts))

  /** Duplicate-spreading salt: mixes in a per-partition row counter
    * (`monotonically_increasing_id`) so even byte-identical rows of a
    * hot key fan out round-robin — the canonical dedup-input skew case,
    * where a values-only hash would re-collapse them onto one reducer.
    * The counter follows within-partition arrival order, so it is only
    * recomputation-stable when the input's partitioning and row order
    * are (file scans and other deterministic narrow lineage, or cached /
    * checkpointed data). Callers opt in via `spreadDuplicates = true`
    * and own that precondition; `large.localCheckpoint()` establishes
    * it when in doubt. The counter affects only placement, never the
    * result (every salt bucket joins the same replicated small side). */
  private[ops] def spreadingSaltExpr(large: DataFrame, nSalts: Int): Column =
    pmod(
      xxhash64(large.columns.map(col).toIndexedSeq :+ monotonically_increasing_id(): _*),
      lit(nSalts))

  /** Inner equi-join of `large` ⋈ `small` on `largeKey` = `smallKey`,
    * salted `nSalts` ways. Output columns = large ++ small (minus the
    * duplicate key), like a plain join; a shared key NAME is fine.
    * `spreadDuplicates = true` additionally fans out byte-identical
    * duplicate rows at the cost of a retry-stability precondition on
    * the input — see [[spreadingSaltExpr]]. */
  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String, nSalts: Int,
      spreadDuplicates: Boolean = false): DataFrame = {
    val salt =
      if (spreadDuplicates) spreadingSaltExpr(large, nSalts)
      else saltExpr(large, nSalts)
    val l = large.withColumn("__salt", salt)
    // rename the small key so largeKey == smallKey can't make the join
    // condition ambiguous or the final drop eat the large side's key
    val s = small.withColumnRenamed(smallKey, "__small_key")
      .withColumn("__salt",
        explode(sequence(lit(0), lit(nSalts - 1)).cast("array<long>")))
      // salting presumes the small side is NOT broadcastable (else you
      // would broadcast and skew wouldn't exist) — pin a shuffle join
      // so the demonstrated plan matches the scale scenario even when
      // AQE would happily broadcast at test scale
      .hint("shuffle_hash")
    l.join(s, l("__salt") === s("__salt") && l(largeKey) === s("__small_key"))
      .drop("__salt", "__small_key")
  }
}
