package graft.streaming

import org.apache.spark.sql.DataFrame

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
}
