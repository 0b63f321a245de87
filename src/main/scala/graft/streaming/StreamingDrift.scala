package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Drift

/** Streaming twin of [[graft.ops.Drift]] — live distribution-drift
  * monitoring of an ingest stream against a frozen reference sample
  * ("has this source shifted since we trained?").
  *
  * Per-(group, bin) counts are ADDITIVE partials, so the
  * [[IncrementalPartials]] pattern applies: each micro-batch writes
  * its own bin-count increment under `batch_id=N` (idempotent on
  * replay); the report side sums increments per bin and runs the same
  * order-insensitive TV/χ² arithmetic as the batch operator — numbers
  * identical to one batch pass over everything streamed. State per
  * batch is |groups|×|bins| counters whatever the batch row count.
  */
object StreamingDrift {

  /** Start materializing per-batch (group, bin, n) increments. */
  def start(stream: DataFrame, groupCol: String, binCol: Column,
      outDir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IncrementalPartials.start(stream,
      b => b.groupBy(col(groupCol), binCol.as("bin"))
        .agg(count(lit(1)).as("n")),
      outDir, checkpoint, trigger)

  /** Drift report of everything streamed so far (sample A) against a
    * frozen reference of per-(group, bin) counts (sample B, column
    * `n`). Same output columns as [[Drift.histogramDrift]]. */
  def report(spark: SparkSession, outDir: String, groupCol: String,
      reference: DataFrame): DataFrame = {
    val streamed = spark.read.parquet(outDir)
      .groupBy(col(groupCol), col("bin")).agg(sum("n").as("a"))
    val ref = reference.select(col(groupCol), col("bin"), col("n").as("b"))
    val bins = streamed.join(ref, Seq(groupCol, "bin"), "full_outer")
      .select(col(groupCol), col("bin"),
        coalesce(col("a"), lit(0L)).as("a"),
        coalesce(col("b"), lit(0L)).as("b"))
    Drift.driftFromCounts(bins, groupCol)
  }
}
