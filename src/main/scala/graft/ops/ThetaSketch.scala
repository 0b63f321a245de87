package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.DetHash

/** KMV / theta-sketch distinct-count set algebra (Bar-Yossef et al.
  * 2002; Dasgupta et al., "Theta sketches", 2016 — the DataSketches
  * formulation): keep the k smallest distinct hash values of a key;
  * estimate a set expression's cardinality from retained samples below
  * a threshold θ.
  *
  *  - sketch build is fully distributed: `distinct` (hash shuffle,
  *    map-side combined) + `orderBy.limit(k)` (TakeOrdered — per-
  *    partition top-k, never a global sort);
  *  - sketches are mergeable: the k smallest of a union of sketches IS
  *    the union's sketch (any union-top-k hash is a top-k hash of the
  *    set it came from), so per-partition / per-day sketches roll up
  *    without touching raw data — the 100 TB shape;
  *  - set operations run on ≤ k-row frames, so they collect to the
  *    driver under the bounded-localize contract and are pure integer /
  *    IEEE-double arithmetic — bit-identical to the DuckDB oracle,
  *    which replays the same hashes ([[DetHash.hash52]]) and the same
  *    estimator.
  *
  * Estimator: θ = the k-th smallest hash when the sketch saturated,
  * else the whole-space sentinel 2^52 (sketch is exhaustive ⇒ exact).
  * With c = |{h < θ}| of the relevant set expression,
  * est = c · 2^52 / θ — which degrades to the exact count in
  * exhaustive mode and to the classic (k−1)/U(k) KMV estimator when
  * saturated. Intersections use θ = min(θ_A, θ_B, θ_∪): below that
  * threshold each sketch decides membership exactly.
  */
object ThetaSketch {

  /** Whole hash space: 2^52 (hash52 values are uniform in [0, 2^52)). */
  val Space: Double = 4503599627370496.0
  val Sentinel: Long = 4503599627370496L

  /** The KMV sketch of `key` over `df`: k smallest distinct 52-bit
    * hashes, one `h` column. */
  def kmv(df: DataFrame, key: Column, k: Int): DataFrame =
    df.select(DetHash.hash52(key).as("h"))
      .where(col("h").isNotNull)
      .distinct()
      .orderBy("h")
      .limit(k)

  /** Merge sketches: the k smallest of the combined value sets. */
  def merge(k: Int, sketches: DataFrame*): DataFrame =
    sketches.reduce(_ union _).distinct().orderBy("h").limit(k)

  /** θ and the strictly-below-θ sample count of a sorted hash array. */
  private def thetaOf(sorted: Array[Long], k: Int): (Long, Int) =
    if (sorted.length < k) (Sentinel, sorted.length)
    else (sorted.last, k - 1)

  private def est(countBelow: Int, theta: Long): Long =
    math.round(countBelow * Space / theta.toDouble)

  /** One-row estimate frame for the full set algebra of two sketches:
    * per-set, union, and intersection distinct-count estimates plus a
    * Jaccard estimate in basis points. Both inputs must be `kmv`/
    * `merge` outputs with the same k (≤ k rows by construction — the
    * collect below is bounded by 2k longs). */
  def setOps(spark: SparkSession, skA: DataFrame, skB: DataFrame,
      k: Int): DataFrame = {
    val a = skA.orderBy("h").collect().map(_.getLong(0))
    val b = skB.orderBy("h").collect().map(_.getLong(0))
    require(a.length <= k && b.length <= k,
      s"inputs must be k=$k sketches, got ${a.length}/${b.length} rows")
    val (thA, belowA) = thetaOf(a, k)
    val (thB, belowB) = thetaOf(b, k)
    val u = (a ++ b).distinct.sorted
    val uk = u.take(k)
    val (thU, _) = thetaOf(uk, k)
    val theta = math.min(math.min(thA, thB), thU)
    val aSet = a.toSet
    val bSet = b.toSet
    val uBelow = u.filter(_ < theta)
    val cu = uBelow.length
    val ci = uBelow.count(h => aSet(h) && bSet(h))
    val jaccardBp =
      if (cu == 0) 0L else math.round(10000.0 * ci / cu)
    val row = Row(
      est(belowA, thA), est(belowB, thB),
      est(cu, theta), est(ci, theta), jaccardBp)
    val schema = StructType(Seq("est_a", "est_b", "est_union",
      "est_inter", "jaccard_bp").map(StructField(_, LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), schema)
  }
}
