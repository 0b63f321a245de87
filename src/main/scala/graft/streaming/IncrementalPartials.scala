package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The generic streaming shape for ANY additively-mergeable partial
  * (count-min counters, histogram-quantile bins, HLL registers,
  * overview daily stats): each micro-batch computes its OWN partials
  * and writes them under `batch_id=N` with dynamic partition
  * overwrite, so
  *
  *  - a RETRIED batch rewrites its partition instead of
  *    double-counting (idempotent per batch id),
  *  - no read-modify-write cycle ever touches previous increments,
  *  - any reader merges increments on the fly with the operator's own
  *    merge (addition), getting numbers identical to one batch pass
  *    over the union of inputs.
  *
  * [[StreamingFreq]] is this pattern with
  * [[graft.ops.FreqSketch.sketchPartials]]; pass any other partials
  * builder for its streaming twin.
  */
object IncrementalPartials {

  /** @param afterBatch runs after the increment has landed on disk but
    *   BEFORE the streaming commit records the batch — i.e. inside the
    *   crash window the batch_id overwrite exists for. Production use:
    *   metrics, compaction triggers. Tests throw here to prove a
    *   replayed batch rewrites its partition instead of double-counting
    *   (IncrementalPartialsSpec). */
  def start(stream: DataFrame, buildPartials: DataFrame => DataFrame,
      outDir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      afterBatch: Long => Unit = _ => ()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          // the cloned micro-batch session needs its own overwrite mode
          batch.sparkSession.conf
            .set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          buildPartials(batch)
            .withColumn("batch_id", org.apache.spark.sql.functions.lit(id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(outDir)
        }
        afterBatch(id)
      }
      .start()
}
