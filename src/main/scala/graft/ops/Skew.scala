package graft.ops

import org.apache.spark.sql.DataFrame
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
  */
object Skew {

  /** Inner equi-join of `large` ⋈ `small` on `largeKey` = `smallKey`,
    * salted `nSalts` ways. The salt mixes the row's values with a
    * per-partition row counter (`monotonically_increasing_id`), so even
    * BYTE-IDENTICAL duplicate rows of a hot key fan out round-robin — a
    * values-only hash would re-collapse them onto one reducer, which is
    * exactly the canonical dedup-input skew case. The id term affects
    * only placement, never the result (every salt bucket joins the same
    * replicated small side). Output columns = large ++ small (minus the
    * duplicate key), like a plain join; a shared key NAME is fine. */
  /** The large side's salt: values + per-partition row counter. */
  private[ops] def saltExpr(large: DataFrame, nSalts: Int) =
    pmod(
      xxhash64(large.columns.map(col).toIndexedSeq :+ monotonically_increasing_id(): _*),
      lit(nSalts))

  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String, nSalts: Int): DataFrame = {
    val l = large.withColumn("__salt", saltExpr(large, nSalts))
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
