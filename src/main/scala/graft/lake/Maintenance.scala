package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lake maintenance: small-file compaction with multi-dimensional
  * (Z-order) clustering — the OPTIMIZE/ZORDER tier of a 100 TB lake.
  *
  * Why it matters at scale: a streaming or incremental ingest leaves
  * thousands of small files whose per-file column min/max ranges all
  * span the whole domain, so predicate-driven file skipping prunes
  * nothing and every query pays the full scan. Rewriting each partition
  * into a few large files ordered by an interleaved (Morton) key gives
  * every file a tight min/max box in EVERY interleaved dimension at
  * once — a filter on any one of them skips most files (a plain sort
  * only tightens its leading column). Reference analogue: the merge
  * step in merge_data.py (MHM-data-pipelines merge_data.py:84-118)
  * rewrites many per-upload CSVs into one parquet per (site, metric) —
  * same operation, minus the clustering, which the reference never
  * needed at its scale.
  *
  * Spark-first: the Morton key is a statically-unrolled tree of
  * shift/mask/or over plain columns (whole-stage codegen, no UDF), the
  * layout is `repartitionByRange(zkey)` (range exchange = equal-sized
  * output files) + `sortWithinPartitions(zkey)` (tight row-group stats
  * inside each file). Both are declarative — Catalyst sees an ordinary
  * exchange + sort, and AQE can still right-size the shuffle.
  */
object Maintenance {

  /** Interleave the low `bits` bits of two non-negative integral
    * columns into a single Z-order (Morton) key: bit i of `a` lands at
    * position 2i+1, bit i of `b` at position 2i. Statically unrolled —
    * 2*bits shift/mask/or terms, all codegen'd; no UDF, no loop at
    * runtime.
    */
  def mortonKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** True N-dimensional Z-order (Morton) key: bit i of dimension j
    * lands at position `i*N + (N-1-j)` — earlier columns take the more
    * significant slot within each bit group, so
    * `mortonKeyN(Seq(a, b))` == [[mortonKey]]`(a, b)` exactly. This IS
    * a z-order for N dims (every dimension's bits interleave at the
    * same granularity), unlike a fold of pairwise interleaves — which
    * is why the SQL `OPTIMIZE ... ZORDER BY` route refused >2 columns
    * until this existed. Statically unrolled (`N*bits` shift/mask/or
    * terms, whole-stage codegen, no UDF); `N*bits` must fit a signed
    * long (≤63). Dimensions must be non-negative integral (or
    * pre-scaled via [[gridBucket]]); resolution per dimension falls as
    * N grows — past ~4 dims the per-file boxes stop being tight in any
    * of them, so prefer the few highest-selectivity columns.
    */
  def mortonKeyN(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.length
    require(n >= 1, "mortonKeyN needs at least one column")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits must be in [1,63] to fit a long key, got $n*$bits")
    if (n == 1) return cols.head.cast("long")
    // native single-pass interleave, each dimension referenced ONCE:
    // the shift/mask/or composition re-embedded every dimension's
    // whole expression subtree per interleaved bit — over quantile
    // trees that made a ~40k-node sort key Catalyst re-walked on
    // every (re-)planning pass (ZOrderExpressions has the numbers);
    // values are bit-identical (MaintenanceSpec pins the equivalence)
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.ZInterleave(
        cols.map(c => org.apache.spark.sql.GraftColumnBridge
          .expression(c.cast("long"))), bits))
  }

  /** Min-max scale a numeric column onto the [0, 2^bits) integer grid
    * (the usual pre-step for [[mortonKey]] over non-integer or
    * wide-range dimensions). `lo`/`hi` are the domain bounds — pass
    * precomputed stats, don't make the layout job scan twice.
    */
  def gridBucket(c: Column, lo: Double, hi: Double, bits: Int = 16): Column = {
    require(hi > lo, s"gridBucket needs hi > lo, got [$lo, $hi]")
    val cells = (1L << bits) - 1
    least(lit(cells), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(cells.toDouble))
        .cast("long")))
  }

  /** Rank-space bucket: the index of `c` among the sorted `cuts`
    * (bucket = number of cuts at or below the value, in
    * [0, cuts.size]) as a BALANCED comparison tree — log2(cells)
    * comparisons per row, statically unrolled, whole-stage codegen,
    * no UDF. The quantile twin of [[gridBucket]]: cells hold equal
    * POPULATION instead of equal WIDTH, so a skewed dimension (zipf
    * ids, hot enum values) still spreads its files across the grid
    * where the linear scaling collapses the tail into one cell — and
    * because the comparisons are plain Column ops, STRING dimensions
    * cluster lexicographically with no numeric surrogate column.
    * NULLs land in bucket 0 (they sort first, like Spark's own
    * ordering). `cuts` must be sorted ascending and duplicate-free.
    */
  def quantileBucket(c: Column, cuts: Seq[Column]): Column = {
    require(cuts.nonEmpty, "quantileBucket needs at least one cut")
    // literal DOUBLE/STRING cuts (every production caller: clusterKey
    // pre-casts and lifts plain values) take the NATIVE binary-search
    // expression — the balanced `when` tree is ~5 Catalyst nodes per
    // cell, which at 256 cells per dimension made clustered-write
    // PLANNING the dominant cost (ZOrderExpressions has the numbers).
    // Same values: lower_bound by Java `<` (NaN falls past every cut),
    // null → bucket 0. Non-literal or other-typed cuts keep the tree.
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val litsD = cuts.map(expression).collect {
      case Literal(v: Double, org.apache.spark.sql.types.DoubleType) => v }
    val litsS = cuts.map(expression).collect {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String,
        org.apache.spark.sql.types.StringType) => s }
    if (litsD.size == cuts.size)
      return column(graft.functions.RankBucketDouble(
        expression(c), litsD.toArray))
    if (litsS.size == cuts.size)
      return column(graft.functions.RankBucketString(
        expression(c), litsS.toArray))
    def tree(lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo.toLong)
      else {
        val mid = (lo + hi) / 2
        when(c < cuts(mid), tree(lo, mid)).otherwise(tree(mid + 1, hi))
      }
    when(c.isNull, lit(0L)).otherwise(tree(0, cuts.size))
  }

  /** Rewrite `df` as ~`nFiles` parquet files range-partitioned and
    * sorted by `zkey`. The key column is dropped before the write — it
    * is layout, not data — and because the final Project preserves the
    * child's partitioning and ordering, no extra exchange appears
    * between the sort and the write.
    */
  def compact(df: DataFrame, zkey: Column, nFiles: Int, out: String): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    df.withColumn("__zkey", zkey)
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
      .write.mode("overwrite").parquet(out)
  }

  /** Per-file min/max spread of a column — the file-skipping health
    * metric a compaction job reports. `sum(spread)` across files is
    * proportional to the expected number of files a uniform point
    * filter on `c` CANNOT skip; clustered layouts drive it toward
    * `domain`, scattered layouts toward `nFiles * domain`.
    */
  def fileSpread(df: DataFrame, c: Column): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(c).as("lo"), max(c).as("hi"), count(lit(1)).as("rows"))

  /** Incremental-OPTIMIZE planner: which partitions of a lake need a
    * compaction pass, from a file inventory (path, size — the shape
    * [[PathModel.listFiles]] returns, or an S3 Inventory scan at
    * 100 TB). A partition is flagged when it holds more than `maxFiles`
    * files OR any file under `minBytes` (small-file debt); the plan
    * prescribes `ceil(bytes / targetBytes)` output files, min 1. The
    * planner is a pure aggregate — the EXECUTION is one bounded
    * [[compact]] per flagged partition, so steady-state maintenance
    * cost tracks ingest churn, never lake size.
    */
  def compactionPlan(inventory: DataFrame, partitionOf: Column,
      maxFiles: Int, minBytes: Long, targetBytes: Long): DataFrame = {
    require(maxFiles >= 1 && minBytes >= 0 && targetBytes >= 1,
      s"bad thresholds: maxFiles=$maxFiles minBytes=$minBytes targetBytes=$targetBytes")
    inventory
      .groupBy(partitionOf.as("partition"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("size")).as("bytes"),
        sum(when(col("size") < minBytes, 1L).otherwise(0L)).as("n_small"))
      .withColumn("needs_compaction",
        col("n_files") > maxFiles || col("n_small") > 0)
      .withColumn("target_files",
        greatest(lit(1L), ceil(col("bytes").cast("double") / targetBytes).cast("long")))
  }
}
