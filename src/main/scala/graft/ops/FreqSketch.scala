package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.DetHash

/** Mergeable count-min frequency sketch — the heavy-hitter member of the
  * mergeable-sketch family next to HLL distincts ([[ApproxDistinct]]),
  * bloom membership ([[BloomPrune]]) and histogram quantiles
  * ([[QuantileSketch]]).
  *
  * Exact per-value frequencies over a high-cardinality column shuffle
  * one row per distinct value; the sketch reduces every increment to
  * `depth × width` counters that merge by ADDITION (the partial→final
  * contract of the reference's accumulate_stats,
  * process-overview.py:168-194), so day-sized partials can be persisted
  * and unioned incrementally like the HLL and quantile partials. The
  * estimate for any value is the MINIMUM over `depth` independent rows
  * of the counter its hash lands in — always an OVERestimate (collisions
  * only add), with the classic ε·N bound for width ≥ e/ε.
  *
  * Hashing is [[DetHash.hash52]] over a per-row seeded key, so a DuckDB
  * oracle reproduces the sketch AND the estimates bit-exactly (q74) —
  * no rows-only weak check, same rationale as MinHash (q32).
  */
object FreqSketch {

  /** Frozen per-depth-row seed prefix. Changing it changes the sketch. */
  private def seeded(valueCol: Column, row: Int): Column =
    concat_ws(":", lit(s"cms$row"), valueCol.cast("string"))

  /** Bucket index of `valueCol` in depth row `row`. */
  def bucket(valueCol: Column, row: Int, width: Int): Column =
    pmod(DetHash.hash52(seeded(valueCol, row)), lit(width.toLong))

  /** DuckDB rendering of [[bucket]] over a SQL expression. */
  def sqlBucket(expr: String, row: Int, width: Int): String =
    s"(${DetHash.sqlHash52(s"'cms$row:' || ($expr)")} % $width)"

  private def requireParams(width: Int, depth: Int): Unit =
    require(width > 0 && depth > 0 && depth <= 8,
      s"need width > 0 and 0 < depth <= 8, got width=$width depth=$depth")

  /** The sketch as a DataFrame: one row per non-empty (depth, bucket)
    * counter — at most `depth × width` rows regardless of input size.
    * One aggregation; map-side partials bound the shuffle to
    * `depth × width` rows per input partition. NULL values are skipped
    * (they have no defensible bucket and no frequency question). */
  def sketchPartials(df: DataFrame, valueCol: String,
      width: Int, depth: Int): DataFrame = {
    requireParams(width, depth)
    val v = col(valueCol)
    val buckets = array((0 until depth).map(r => bucket(v, r, width)): _*)
    df.filter(v.isNotNull)
      .select(posexplode(buckets).as(Seq("depth", "bucket")))
      .groupBy("depth", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge partial sketches (e.g. a union of per-day increments) by
    * summing counters — the additive merge. */
  def merge(partials: DataFrame): DataFrame =
    partials.groupBy("depth", "bucket").agg(sum("cnt").as("cnt"))

  /** Point estimates for `probes` (any DataFrame with `probeCol`):
    * min over depth rows of the landed counter. The sketch side is
    * `depth × width` rows — broadcast it; the probe side never
    * shuffles. Values the sketch has never seen still return their
    * collision mass (≥ 0), like any count-min. Estimates are exact
    * when no OTHER value shares all `depth` buckets — the regime the
    * oracle query pins at test scale. */
  def estimate(sketch: DataFrame, probes: DataFrame, probeCol: String,
      width: Int, depth: Int): DataFrame = {
    requireParams(width, depth)
    val v = col(probeCol)
    val buckets = array((0 until depth).map(r => bucket(v, r, width)): _*)
    // NULL probes are dropped to match the build side: sketchPartials
    // never buckets NULLs, so bucket(NULL) would hash the bare seed and
    // hand NULL some other value's collision mass
    val probed = probes.filter(v.isNotNull)
      .select(v, posexplode(buckets).as(Seq("depth", "bucket")))
    probed.join(broadcast(merge(sketch)), Seq("depth", "bucket"), "left")
      .groupBy(probeCol)
      // a probe row missing from the sketch means that counter is 0
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Heavy hitters: values of `valueCol` whose estimate is at least
    * `minCount` — WITHOUT enumerating the column's distinct values.
    * Every row is scored against the broadcast sketch (one left join
    * per depth row on the bucket index) and the `est >= minCount`
    * filter runs BEFORE the dedup shuffle, so tail values die map-side
    * and the shuffle carries at most the surviving heavy values per
    * partition (≤ N/minCount true hitters plus collision false
    * positives) — not one row per distinct value, which on a
    * high-cardinality column is exactly the shuffle the sketch exists
    * to avoid. Count-min overestimates, so the result is a SUPERSET of
    * the true heavy hitters — verify with an exact count over just the
    * candidates when false positives matter (the LSH candidate→verify
    * shape, [[graft.ext.Dedup.jaccardOnCandidates]]). */
  def heavyHitters(df: DataFrame, valueCol: String,
      width: Int, depth: Int, minCount: Long): DataFrame = {
    requireParams(width, depth)
    val spark = df.sparkSession
    val sk = merge(sketchPartials(df, valueCol, width, depth))
    // The merged sketch is ≤ depth×width counter rows and must fit in a
    // broadcast for the probe joins below anyway — collecting it once
    // (same bounded-collect rationale as the IVF centroid table,
    // Similarity.scala) avoids recomputing the build aggregation for
    // each per-depth join.
    val local = spark.createDataFrame(
      java.util.Arrays.asList(sk.collect(): _*), sk.schema)
    val v = col(valueCol)
    var probed = df.filter(v.isNotNull).select(v)
    val ests = (0 until depth).map { r =>
      val skr = local.filter(col("depth") === r)
        .select(col("bucket").as(s"__b$r"), col("cnt").as(s"__c$r"))
      probed = probed
        .withColumn(s"__b$r", bucket(v, r, width))
        .join(broadcast(skr), Seq(s"__b$r"), "left")
      // an empty counter row was never materialized — its count is 0
      coalesce(col(s"__c$r"), lit(0L))
    }
    probed
      // pairwise reduce, not least(ests: _*): Least rejects a single
      // child, which a legal depth=1 sketch produces
      .select(v, ests.reduce((a, b) => least(a, b)).as("est"))
      .filter(col("est") >= minCount)
      .distinct()
  }
}
