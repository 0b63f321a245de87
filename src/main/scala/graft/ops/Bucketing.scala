package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-shuffled) tables for co-located joins — the third leg
  * of the join-at-scale toolkit next to `broadcast()` (small dims) and
  * [[Skew.saltedJoin]] (hot keys).
  *
  * A fact⋈fact join on a shared key shuffles BOTH sides every run. When
  * the same join recurs (the reference's merge → overview → summary
  * chain re-joins on (site, participant) constantly; at 100 TB the
  * shuffle dominates the job), bucketing pays the shuffle ONCE at write
  * time: `bucketBy(n, key)` hash-partitions files on disk, and Spark's
  * scan reports `HashPartitioning(key, n)` so SortMergeJoin needs no
  * Exchange on either side — `BucketingSpec` asserts the plan is
  * exchange-free and result-identical to the plain join.
  *
  * Sizing at 100 TB: pick `nBuckets` so a bucket of the LARGER table
  * fits an executor's read (~`table_size / nBuckets` ≲ 1 GiB), and
  * bucket both tables with the SAME n and key; mismatched counts fall
  * back to shuffling the smaller side (Spark only avoids exchanges on
  * equal bucket counts unless `spark.sql.bucketing.coalesceBucketsInJoin`
  * applies). `sortBy` the key inside buckets so the SMJ's per-bucket
  * sort is a cheap merge of pre-sorted runs.
  *
  * Bucketed data must go through the catalog (`saveAsTable`) — a plain
  * parquet path write discards bucket metadata.
  */
object Bucketing {

  /** Pay the shuffle once: persist `df` as a bucketed, in-bucket-sorted
    * catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val spark = df.sparkSession
    if (mode == SaveMode.Overwrite && !spark.catalog.tableExists(table)) {
      // With the in-memory catalog, a managed table's LOCATION can
      // outlive its catalog entry across JVMs; CTAS then refuses the
      // "existing location". Under OVERWRITE (and only then — Append /
      // ErrorIfExists must not wipe pre-existing data, ADVICE r3), an
      // unregistered location is unreachable data (bucket metadata
      // lives in the catalog) — clear it, but only if the directory
      // actually looks like a Spark table (parquet parts + markers),
      // not some unrelated path that happens to share the name.
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) {
        val entries = fs.listStatus(wh).map(_.getPath.getName)
        val tableLike = entries.forall(n =>
          n.endsWith(".parquet") || n.startsWith("_") || n.startsWith("."))
        require(tableLike, s"refusing to clear $wh: directory does not " +
          "look like an orphaned Spark table location")
        fs.delete(wh, true)
      }
    }
    df.write
      .mode(mode)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketed tables on their bucket keys. With both
    * sides bucketed `nBuckets` on the join key this plans as an
    * exchange-free SortMergeJoin. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
