package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `merge-data.py` / `collect_data_metadata.py` semantics
  * (SURVEY.md §2.4 U1-U2, §2.2 P1).
  *
  * Reference: for each (site, participant, metric) group, read every
  * per-day csv.gz, attach lineage columns, `pd.concat` (aligning columns
  * by name, NaN-filling gaps), write one merged file
  * (`merge-data.py:54-100`).
  *
  * Spark-first: one scan of all files; lineage comes from the path
  * (partition columns / regexp over `input_file_name()`), the concat is
  * the scan itself, schema drift across files is `unionByName(
  * allowMissingColumns = true)`, and "one output file per group" is
  * `partitionBy(site, participant, metric)` with dynamic partition
  * overwrite — per-group idempotent rewrite, which is also the U2
  * incremental story (re-running overwrites only touched groups).
  * No driver-side loop over groups: at 100 TB the groups are millions.
  */
object MergeData {

  /** P1: lineage columns the reference attaches to every merged row
    * (`merge-data.py:81-83`): file_timestamp (ISO string), site,
    * participant_id. Expects the scan to carry path-derived columns
    * already (see [[graft.lake.PathModel.parsePaths]]). */
  def withLineage(df: DataFrame): DataFrame =
    df.withColumn("file_timestamp",
      date_format(col("file_timestamp"), "yyyy-MM-dd'T'HH:mm:ss"))

  /** U1 cross-schema union: pandas `concat` aligns by column name and
    * fills missing with NaN; the Spark equivalent. */
  def unionDrift(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** U1+U2: merge a raw lake scan into a partitioned merged lake.
    * Dynamic partition overwrite = only groups present in `df` are
    * rewritten (the reference's skip-existing/--update flags both
    * degenerate to this idempotent behavior).
    *
    * The write clusters rows by the partition keys first: without it,
    * EVERY upstream task opens a file in EVERY group directory
    * (observed 286 files for 60 groups at sf0.1) — the small-files
    * problem that murders the downstream scan at lake scale. One
    * shuffle buys one file per group. A group too big for one task
    * would need a salt column appended to the repartition keys; these
    * per-(site,participant,metric) groups are day-file unions and stay
    * far below task size. */
  /** `format`: "parquet" (default) or "csv.gz" — the reference's two
    * output formats (merge-data.py:93-96 writes gzipped csv by default
    * with `--parquet` opting into parquet; we default the other way,
    * parquet being the only sane lake format at scale). Parity with the
    * reference's csv.gz deliverable is at the CONTENT level: the
    * reference writes site/participant_id/metric as data columns inside
    * each group's file (merge-data.py:81-83), so the csv.gz branch
    * partitions on COPIES and keeps the originals in the rows; the
    * directory layout itself is Hive-style (`key=value`), not the
    * reference's bare `site/participant/metric` nesting. */
  def writeMerged(spark: SparkSession, df: DataFrame, outDir: String,
      format: String = "parquet"): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      def writer(d: DataFrame, keys: Seq[String]) =
        d.repartition(keys.map(col): _*)
          .write
          .mode("overwrite")
          .partitionBy(keys: _*)
      format match {
        case "parquet" =>
          writer(df, Seq("site", "participant_id", "metric")).parquet(outDir)
        case "csv.gz" =>
          // Hive partitioning strips partition columns from file
          // contents; the reference's merged csv carries them as data
          // columns, so partition on copies and keep the originals
          val keyed = df
            .withColumn("_p_site", col("site"))
            .withColumn("_p_participant_id", col("participant_id"))
            .withColumn("_p_metric", col("metric"))
          writer(keyed, Seq("_p_site", "_p_participant_id", "_p_metric"))
            .option("header", "true")
            .option("compression", "gzip").csv(outDir)
        case other => throw new IllegalArgumentException(
          s"writeMerged format must be parquet or csv.gz, got $other")
      }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
