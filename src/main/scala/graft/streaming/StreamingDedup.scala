package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the incremental twin of
  * [[graft.ext.Dedup.exactGroups]]'s batch semantics (q30).
  *
  * `dropDuplicatesWithinWatermark` keeps one row per key with state
  * GC'd once the watermark passes a key's last sighting: duplicates
  * arriving within the watermark window dedup exactly; a re-arrival
  * AFTER state expiry re-emits (bounded-state tradeoff — plain
  * streaming `dropDuplicates` would be exact forever but its state
  * grows without bound, which is the scale-killer at 100 TB of docs).
  * Batch replay of a corpus through this = batch distinct-per-key when
  * every duplicate pair lands within the lateness window.
  *
  * Key on the CONTENT HASH (md5/fingerprint), not the document text:
  * state then stores a 16-byte key instead of the full doc.
  */
object StreamingDedup {

  /** Drop duplicate `keyCols` rows, tolerating `lateness` of event-time
    * disorder on `tsCol`. Emits each first-seen row in append mode. */
  def dedupStream(df: DataFrame, tsCol: String, keyCols: Seq[String],
      lateness: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming twin of [[graft.ext.Dedup.dedupIncrement]]: dedup a
    * document stream against a STATIC history-fingerprint table (the
    * persisted output of prior increments) and then against itself.
    * The stream-static anti-join runs per micro-batch against the
    * small fp-only table (broadcast when it fits); in-stream dedup
    * keys on the md5 hex string (32 chars — `unhex` it to halve
    * per-key state if the corpus pushes state size) with
    * watermark-bounded state. The
    * lateness window is the exactness contract: a duplicate arriving
    * later than `lateness` after its first sighting re-emits. */
  def dedupStreamVsHistory(stream: DataFrame, historyFps: DataFrame,
      tsCol: String, textCol: String,
      lateness: String = "1 hour"): DataFrame =
    dedupStream(
      stream.withColumn("fp", md5(col(textCol).cast("binary")))
        .join(historyFps.select(col("fp")), Seq("fp"), "left_anti"),
      tsCol, Seq("fp"), lateness)
}
