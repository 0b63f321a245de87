package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.PrioritySample

/** Streaming twin of [[graft.ops.PrioritySample]] — a live weighted
  * sample of everything streamed so far.
  *
  * Per-group top-(k+1) priority candidates are MERGEABLE partials (the
  * union's top-(k+1) is contained in the union of per-batch
  * top-(k+1)s), so the [[IncrementalPartials]] pattern applies: each
  * micro-batch persists its ≤ (k+1)-rows-per-group candidate increment
  * (idempotent on replay), and the read side re-finishes the union —
  * sample membership, ranks, and max(w, τ) estimation weights all
  * identical to one batch pass over the full stream. Per-batch state
  * is bounded by groups × (k+1) whatever the batch size, and the raw
  * stream is never retained.
  */
object StreamingPrioritySample {

  def start(stream: DataFrame, idCol: String, weightCol: String, k: Int,
      groupCols: Seq[String], outDir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IncrementalPartials.start(stream,
      b => PrioritySample.candidates(b, idCol, weightCol, k, groupCols),
      outDir, checkpoint, trigger)

  /** The sample over everything streamed so far. */
  def sample(spark: SparkSession, outDir: String, idCol: String,
      weightCol: String, k: Int, groupCols: Seq[String]): DataFrame =
    PrioritySample.finishSample(
      spark.read.parquet(outDir).drop("batch_id"),
      idCol, weightCol, k, groupCols)
}
