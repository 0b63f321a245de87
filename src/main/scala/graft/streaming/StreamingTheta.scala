package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.ThetaSketch

/** Streaming twin of [[graft.ops.ThetaSketch]] — live distinct-count
  * set algebra.
  *
  * KMV sketches are MERGEABLE (the k smallest of a union of sketches
  * is the union's sketch), so the [[IncrementalPartials]] pattern
  * applies verbatim: each micro-batch writes its own ≤ k-row sketch
  * increment under `batch_id=N` (idempotent on replay), and a reader
  * re-sketches the union of increments — numbers identical to one
  * batch [[ThetaSketch.kmv]] over everything streamed. State per batch
  * is ≤ k hashes regardless of batch size; no watermark, because
  * distinct-count partials have no event-time completion semantics.
  *
  * Two streams sketched this way feed [[ThetaSketch.setOps]] directly:
  * live union / intersection / Jaccard across, say, today's click
  * stream and purchase stream, without either stream retaining raw
  * keys.
  */
object StreamingTheta {

  def start(stream: DataFrame, keyCol: String, k: Int, outDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IncrementalPartials.start(stream,
      b => ThetaSketch.kmv(b, col(keyCol), k), outDir, checkpoint, trigger)

  /** The sketch of everything streamed so far: merge (re-sketch) the
    * persisted increments. */
  def sketch(spark: SparkSession, outDir: String, k: Int): DataFrame =
    ThetaSketch.merge(k, spark.read.parquet(outDir).select("h"))
}
