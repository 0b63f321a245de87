package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.FreqSketch

/** Streaming twin of [[graft.ops.FreqSketch]] — live heavy hitters.
  *
  * Count-min counters merge by addition, so a stream needs no
  * read-modify-write cycle at all: each micro-batch writes its OWN
  * sketch increment under `batch_id=N` (dynamic partition overwrite —
  * a retried batch rewrites its partition instead of double-counting),
  * and any reader merges all increments on the fly. State per batch is
  * bounded by `depth × width` counters whatever the batch's row count;
  * there is no watermark because frequency partials have no event-time
  * semantics to wait for — every arrival increments immediately, the
  * same contract as the batch sketch over a growing lake.
  */
object StreamingFreq {

  /** Start materializing per-batch sketch increments from `stream` —
    * the [[IncrementalPartials]] pattern with CMS counters. */
  def start(stream: DataFrame, valueCol: String, width: Int, depth: Int,
      outDir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    IncrementalPartials.start(stream,
      b => FreqSketch.sketchPartials(b, valueCol, width, depth),
      outDir, checkpoint, trigger)

  /** Point estimates over everything streamed so far: merge all
    * persisted increments (addition), then probe — identical numbers
    * to one batch [[FreqSketch.estimate]] over the union of inputs. */
  def estimates(spark: SparkSession, outDir: String,
      probes: DataFrame, probeCol: String, width: Int, depth: Int): DataFrame =
    FreqSketch.estimate(
      spark.read.parquet(outDir).select("depth", "bucket", "cnt"),
      probes, probeCol, width, depth)
}
