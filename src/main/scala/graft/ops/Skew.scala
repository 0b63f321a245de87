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
    * salted `nSalts` ways. The salt is a deterministic hash of the
    * large row's key AND a uniformly-spreading second term (the whole
    * row), so identical hot-key rows still fan out. Output columns =
    * large ++ small (minus the duplicate key), like a plain join. */
  def saltedJoin(large: DataFrame, small: DataFrame,
      largeKey: String, smallKey: String, nSalts: Int): DataFrame = {
    val saltCol = pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(nSalts))
    val l = large.withColumn("__salt", saltCol)
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1)).cast("array<long>")))
      // salting presumes the small side is NOT broadcastable (else you
      // would broadcast and skew wouldn't exist) — pin a shuffle join
      // so the demonstrated plan matches the scale scenario even when
      // AQE would happily broadcast at test scale
      .hint("shuffle_hash")
    l.join(s, l("__salt") === s("__salt") && col(largeKey) === col(smallKey))
      .drop("__salt", smallKey)
  }
}
