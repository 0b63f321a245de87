package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.MergeData

/** Streaming incremental view maintenance — q120's feed-delta algebra
  * driven by the CDC stream: each micro-batch merges into the lake
  * (emitting its change-feed increment), then advances a grouped
  * (sum, count) view from THAT increment alone. The lake is scanned
  * exactly once, at [[init]]; afterwards the view's per-batch cost is
  * the feed increment + the view itself (group count, not data size).
  *
  * Exactly-once story: the view is VERSIONED by batch — version N =
  * version N-1 + deltas(feed batch N), written under `batch_id=N` via
  * dynamic partition overwrite. A batch replayed after a crash (merge,
  * feed, even the view write landed; the streaming commit didn't)
  * recomputes from version N-1 — which no crash can have touched — and
  * OVERWRITES its own version, so replay rewrites instead of
  * double-applying: the [[IncrementalPartials]] idempotence contract
  * composed with [[MergeData.feedDeltas]]' preimage algebra. Version
  * history doubles as view time travel and is vacuum-able by dropping
  * old `batch_id=` partitions.
  */
object StreamingView {

  /** Seed the view (version -1) from the lake's current state — the
    * ONE full scan, the same one any materialized-view creation pays. */
  def init(spark: SparkSession, baseDir: String, groupKeys: Seq[String],
      valueCol: String, viewDir: String): Unit = {
    val seed = spark.read.option("mergeSchema", "true").parquet(baseDir)
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(col(valueCol)).as("s"), count(lit(1)).as("n"))
      .withColumn("batch_id", lit(-1L))
    MergeData.writeMerged(spark, seed, viewDir, keys = Seq("batch_id"))
  }

  /** The view at `atBatch` (latest if omitted): resolve the highest
    * committed version <= atBatch and read just that partition. */
  def readView(spark: SparkSession, viewDir: String,
      atBatch: Long = Long.MaxValue): DataFrame = {
    val all = spark.read.parquet(viewDir)
    val ids = all.select("batch_id").distinct().collect()
      .map(_.getAs[Number]("batch_id").longValue()).filter(_ <= atBatch)
    require(ids.nonEmpty, s"no view version <= $atBatch in $viewDir")
    all.filter(col("batch_id") === ids.max).drop("batch_id")
  }

  /** Start the CDC-apply + view-maintenance stream. Per micro-batch:
    * merge into `baseDir` with a feed increment under `feedDir`, then
    * advance the view to version = micro-batch id. `afterBatch` runs
    * before the streaming commit (crash-injection hook, as in
    * [[StreamingMerge.start]]). */
  def start(updates: DataFrame, baseDir: String,
      partitionKeys: Seq[String], rowKey: Seq[String],
      groupKeys: Seq[String], valueCol: String,
      feedDir: String, viewDir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      afterBatch: Long => Unit = _ => ()): StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          MergeData.mergeInto(s, baseDir, batch, partitionKeys, rowKey,
            changeFeed = Some((feedDir, id)))
          val prev = readView(s, viewDir, atBatch = id - 1)
          val delta = MergeData.feedDeltas(
            s.read.parquet(feedDir).filter(col("batch_id") === id),
            groupKeys, valueCol)
          val next = prev.join(delta, groupKeys, "full")
            .select(groupKeys.map(col) ++ Seq(
              (coalesce(col("s"), lit(0.0)) +
                coalesce(col("delta_sum"), lit(0.0))).as("s"),
              (coalesce(col("n"), lit(0L)) +
                coalesce(col("delta_count"), lit(0L))).as("n")): _*)
            .filter(col("n") > 0) // groups emptied by deletes drop out
            .withColumn("batch_id", lit(id))
          MergeData.writeMerged(s, next, viewDir, keys = Seq("batch_id"))
        }
        afterBatch(id)
      }
      .start()
}
