package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.MergeData

/** Streaming row-level MERGE INTO — the CDC-apply loop: a stream of
  * upsert/delete rows continuously maintained into a copy-on-write
  * partitioned parquet lake via [[MergeData.mergeInto]] per micro-batch.
  *
  * Exactly-once story: foreachBatch gives at-least-once delivery — a
  * batch whose merge landed but whose streaming commit didn't record is
  * REPLAYED after restart. mergeInto is idempotent for a fixed batch
  * (MergeIntoSpec pins it: update/delete/insert against the already-
  * merged state reproduces the same state), so replay converges instead
  * of double-applying — same contract as [[IncrementalPartials]], with
  * the batch_id-overwrite trick replaced by set-semantics idempotence.
  * The one rule CDC feeds must keep: a batch must not contain two rows
  * for the same key (classic CDC compaction — keep the LAST change per
  * key per batch; do it upstream or pass a pre-compacted stream).
  *
  * Scale shape is mergeInto's: each micro-batch touches only its own
  * partitions; lake size never enters the per-batch cost.
  */
object StreamingMerge {

  /** @param afterBatch runs after the merge lands but BEFORE the
    *   streaming commit records the batch — the crash window replay
    *   idempotence exists for (tests throw here).
    * @param changeDir optional change-data-feed root: each micro-batch's
    *   resolved update/insert/delete rows land under `batch_id=N` via
    *   dynamic overwrite, so a crash-replayed batch rewrites its own
    *   feed increment — downstream incremental consumers read the feed
    *   append-only and never see a double-applied batch. */
  def start(updates: DataFrame, baseDir: String,
      partitionKeys: Seq[String], rowKey: Seq[String], checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      afterBatch: Long => Unit = _ => (),
      changeDir: Option[String] = None): StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          MergeData.mergeInto(batch.sparkSession, baseDir, batch,
            partitionKeys, rowKey, changeFeed = changeDir.map(d => (d, id)))
        }
        afterBatch(id)
      }
      .start()

  /** [[start]] committing through the manifest protocol
    * ([[graft.lake.Versioned]]): every micro-batch merge is an atomic
    * versioned commit, so the CDC stream accumulates full snapshot
    * history (time travel over the stream's life) and concurrent
    * readers are isolated from in-flight batches. Crash semantics are
    * honest Delta semantics: a replayed batch commits an EXTRA version
    * whose content equals the crashed one (data-level idempotence,
    * VersionedSpec) — version count is at-least-once, data
    * exactly-once. */
  def startVersioned(updates: DataFrame, baseDir: String,
      partitionKeys: Seq[String], rowKey: Seq[String], checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      afterBatch: Long => Unit = _ => ()): StreamingQuery =
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          graft.lake.Versioned.mergeInto(batch.sparkSession, baseDir, batch,
            partitionKeys, rowKey)
        }
        afterBatch(id)
      }
      .start()
}
