package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ops.MergeData

/** Structured Streaming variant of `process-overview.py`'s
  * re-walk-everything loop (SURVEY.md §2.13, §7.4).
  *
  * The reference approximates incrementality by re-walking the lake and
  * rewriting partial stats after each directory
  * (`process-overview.py:277-334`). Spark-first replacement: a file-source
  * stream discovers new files; a watermarked daily-window aggregation
  * emits per-(keys, day) PARTIAL stats; `foreachBatch` upserts them into
  * a partitioned partials table (dynamic partition overwrite — the same
  * idempotent-rewrite trick as [[MergeData.writeMerged]]); the final
  * stats are a batch merge over the partials — exactly the reference's
  * `accumulate_stats` partial+final contract (A2), which
  * `PipelineProps` pins against the one-pass form.
  *
  * The reference has no late-data semantics to preserve (§2.13), so the
  * watermark is OUR contract: partials for a day can still be updated
  * until `lateness` past the max observed event time, then state is
  * dropped.
  */
object StreamingOverview {

  /** File-source stream over a csv.gz lake subtree. An explicit schema
    * is REQUIRED by Structured Streaming (no inference at runtime) —
    * use [[graft.lake.Readers.sidecarStructType]] to materialize one. */
  def readLakeStream(spark: SparkSession, root: String, schema: StructType,
      glob: String = "*.csv.gz"): DataFrame =
    spark.readStream
      .option("header", "true")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .schema(schema)
      .csv(root)

  /** Streaming lake ingestion with PATH lineage — the streaming twin of
    * the batch inventory walk behind q44: a file-source stream over the
    * reference layout (`root/raw/SITE/PARTICIPANT/METRIC/…csv.gz`)
    * whose site/participant/metric columns come from the file path, not
    * the rows. `input_file_name()` feeds the SAME
    * [[graft.lake.PathModel]] column parsers the batch inventory uses
    * (`parsePaths` / `includeExclude` are pure column expressions, so
    * they compose with a streaming scan unchanged) — one lineage
    * definition, two execution modes, zero drift between them.
    *
    * Malformed paths drop exactly as in batch; `exclude` applies the
    * F1 predicate to the parsed lineage — note that in streaming it
    * filters ROWS after the read (the file source has no inventory to
    * prune), so a PERMANENTLY excluded site still costs its
    * decompression: point the stream at per-site roots, or pre-filter
    * with `pathGlobFilter`, when exclusion should prune I/O like the
    * batch inventory does. Incrementality: Spark's file source
    * re-LISTS the tree each trigger (O(total files) driver-side — use
    * notification-based discovery beyond that) but re-READS nothing;
    * `maxFilesPerTrigger` caps a micro-batch. File CONTENTS are
    * processed exactly once — the contract the reference's
    * re-walk-and-recompute loop only approximates. */
  def readLakeStreamWithLineage(spark: SparkSession, root: String,
      schema: StructType, glob: String = "*.csv.gz",
      exclude: Seq[String] = Nil): DataFrame = {
    val raw = readLakeStream(spark, root, schema, glob)
      // normalize the file:-scheme URI so the relative parse against
      // `root` (a plain path) lines up — same trick as the batch side
      .withColumn("path", regexp_replace(input_file_name(), "^file:/+", "/"))
    graft.lake.PathModel.includeExclude(
      graft.lake.PathModel.parsePaths(raw, root), Nil, exclude)
  }

  /** Daily partial stats: one row per (keys, day) with count/min/max —
    * the streaming analogue of the reference's per-file partials. */
  def dailyPartials(df: DataFrame, tsCol: Column, keys: Seq[String],
      lateness: String = "1 day"): DataFrame =
    df.withColumn("__ts", tsCol)
      .withWatermark("__ts", lateness)
      .groupBy(keys.map(col) :+ window(col("__ts"), "1 day").as("win"): _*)
      .agg(
        count(lit(1)).as("row_count"),
        min(col("__ts")).as("min_ts"),
        max(col("__ts")).as("max_ts"))
      .select(keys.map(col) :+ to_date(col("win.start")).as("day") :+
        col("row_count") :+ col("min_ts") :+ col("max_ts"): _*)

  /** Start the incremental materialization: update-mode foreachBatch,
    * each updated (keys, day) partial overwrites exactly its own
    * partition. `Trigger.AvailableNow` processes the current lake then
    * stops — the drop-in replacement for one reference re-walk;
    * `ProcessingTime` keeps it live. */
  def start(spark: SparkSession, stream: DataFrame, keys: Seq[String],
      outDir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // foreachBatch hands over a CLONED micro-batch session: the
        // overwrite mode must be set on THAT session or the write runs
        // static and an empty trailing batch would wipe the output.
        if (!batch.isEmpty) {
          batch.sparkSession.conf
            .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          batch.write.mode("overwrite")
            .partitionBy(keys :+ "day": _*)
            .parquet(outDir)
        }
      }
      .start()

  /** Final stats over the materialized partials: the A2 merge (sum of
    * counts, min of mins, max of maxs, day count = partial-row count).
    * Matches [[graft.ops.Overview.stats]] output columns. */
  def finalStats(spark: SparkSession, partialsDir: String, keys: Seq[String]): DataFrame =
    spark.read.parquet(partialsDir)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("row_count")).as("row_count"),
        date_format(min(col("min_ts")), "yyyy-MM-dd").as("start_date"),
        date_format(max(col("max_ts")), "yyyy-MM-dd").as("end_date"),
        count(lit(1)).as("day_count"))
      .orderBy(keys.map(col): _*)
}
