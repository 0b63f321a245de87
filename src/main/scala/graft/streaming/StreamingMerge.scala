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
    * readers are isolated from in-flight batches. EXACTLY-ONCE at the
    * version level, not just the data level: each commit is stamped
    * with a `(txnId, batchId)` manifest marker (Delta's `txn` action),
    * so a batch replayed after a crash between the versioned commit
    * and the streaming log record is SKIPPED — the version advances
    * once per batch, ever (StreamingMergeSpec pins it).
    *
    * @param txnId identifies this stream in the manifest's txn
    *   markers; defaults to a stable hash of the checkpoint path (the
    *   same stream restarts with the same checkpoint, hence the same
    *   id). Pass explicitly when two streams share a checkpoint
    *   naming scheme.
    * @param changeDir optional CDF root, as in [[start]]: the feed
    *   increment is emitted by the same write-once pre-commit contract,
    *   so snapshot history and the change feed ride one write path. */
  def startVersioned(updates: DataFrame, baseDir: String,
      partitionKeys: Seq[String], rowKey: Seq[String], checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      afterBatch: Long => Unit = _ => (),
      txnId: Option[String] = None,
      changeDir: Option[String] = None): StreamingQuery = {
    // SHA-256 prefix (64 bits) of the checkpoint path: stable across
    // JVMs/restarts for a given checkpoint, and — unlike a 32-bit
    // String.hashCode — collision between two distinct streams'
    // checkpoints (which would silently share a high-water mark and
    // skip each other's batches) is negligible
    val id = txnId.getOrElse {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(checkpoint.getBytes("UTF-8"))
      "ckpt-" + d.take(8).map(b => f"$b%02x").mkString
    }
    updates.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty) {
          graft.lake.Versioned.mergeInto(batch.sparkSession, baseDir, batch,
            partitionKeys, rowKey,
            changeFeed = changeDir.map(d => (d, bid)),
            txn = Some((id, bid)))
        }
        afterBatch(bid)
      }
      .start()
  }

  /** Insert-only streaming ingest through [[graft.lake.Versioned.append]]
    * — the high-volume event firehose: every micro-batch is one blind
    * APPEND commit (a delta manifest of `+file` lines, no resolution,
    * no rewrite, no read of existing data — per-batch cost never sees
    * the lake's size), stamped with the same `(txnId, batchId)` marker
    * as [[startVersioned]] for version-level exactly-once across crash
    * replays. Commit-time stats ride along once the lake tracks them
    * (or pass `statsCols` to establish the discipline from the first
    * batch). Downstream consumers chain off the manifest:
    * [[StreamingTableFollow]] streams exactly these committed appends.
    */
  def startAppend(rows: DataFrame, baseDir: String,
      partitionKeys: Seq[String], checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      afterBatch: Long => Unit = _ => (),
      txnId: Option[String] = None,
      statsCols: Seq[String] = Nil): StreamingQuery = {
    val id = txnId.getOrElse {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(checkpoint.getBytes("UTF-8"))
      "ckpt-" + d.take(8).map(b => f"$b%02x").mkString
    }
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        if (!batch.isEmpty) {
          graft.lake.Versioned.append(batch.sparkSession, baseDir, batch,
            partitionKeys, txn = Some((id, bid)), statsCols = statsCols)
        }
        afterBatch(bid)
      }
      .start()
  }
}
