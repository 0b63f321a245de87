package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.lake.Versioned

/** Streaming source FROM a versioned table (Delta's "stream from a
  * table", composed from this engine's own parts): followers see
  * exactly the COMMITTED state — the manifest gates visibility, so an
  * in-flight writer's data files (written before its manifest rename)
  * can never leak into a micro-batch, which is precisely what a plain
  * file stream over the data directory cannot guarantee.
  *
  * Mechanics: the `_manifest/v*.txt` log is itself an append-only file
  * set, so a text file-stream over it is the NOTIFICATION channel
  * (same trick as [[StreamingReplica]]); each wakeup serves
  *  - the INITIAL SNAPSHOT (version 0) as the first batch, then
  *  - [[Versioned.appendsBetween]](highWater, current) — the rows of
  *    exactly the files appended since, refused loudly if any commit
  *    in the range rewrote files (follow the change feed for those).
  *
  * The high-water mark persists under the checkpoint; batches are
  * handed to `process(df, fromV, toV)` BEFORE the mark advances, so
  * delivery is at-least-once per VERSION RANGE — a process that
  * commits into a versioned sink with `txn = (id, toV)` markers
  * ([[Versioned.append]]/[[Versioned.mergeInto]]) gets end-to-end
  * exactly-once, the same contract as [[StreamingMerge]].
  *
  * Scale shape: per-wakeup driver cost is two manifest resolutions +
  * the high-water file; data cost is a scan of exactly the appended
  * files. The table's size never enters.
  */
object StreamingTableFollow {

  private def hwPath(checkpoint: String) = new Path(checkpoint, "table_follow_hw")

  private def readHw(spark: SparkSession, checkpoint: String): Long = {
    val p = hwPath(checkpoint)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeHw(spark: SparkSession, checkpoint: String, v: Long): Unit = {
    val p = hwPath(checkpoint)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** One follow step — the loop each streaming wakeup runs, exposed
    * for batch catch-up. Serves the initial snapshot first if this
    * checkpoint has never consumed, then any appended versions.
    * Returns the versions served as (fromExclusive, toInclusive). */
  def followOnce(spark: SparkSession, tableDir: String, checkpoint: String,
      process: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val cur = Versioned.currentVersion(spark, tableDir)
    if (cur < 0) return None
    var hw = readHw(spark, checkpoint)
    var served: Option[(Long, Long)] = None
    if (hw < 0) {
      process(Versioned.snapshot(spark, tableDir, 0L), -1L, 0L)
      hw = 0L
      writeHw(spark, checkpoint, hw)
      served = Some((-1L, 0L))
    }
    if (cur > hw) {
      process(Versioned.appendsBetween(spark, tableDir, hw, cur), hw, cur)
      writeHw(spark, checkpoint, cur)
      served = Some((served.map(_._1).getOrElse(hw), cur))
    }
    served
  }

  /** Start following `tableDir`. The notification stream reads only
    * the manifest names (a text stream over `_manifest/v*.txt` — tiny,
    * and glob-scoped away from the stats sidecars); all data reads go
    * through the manifest-resolved [[followOnce]]. */
  def start(spark: SparkSession, tableDir: String, checkpoint: String,
      process: (DataFrame, Long, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val notifications = spark.readStream.text(s"$tableDir/_manifest/v*.txt")
    notifications.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (mb: DataFrame, _: Long) =>
        followOnce(mb.sparkSession, tableDir, checkpoint, process)
        ()
      }
      .start()
  }
}
