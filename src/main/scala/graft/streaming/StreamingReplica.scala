package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.lake.Versioned

/** Streaming change-data-feed SOURCE → continuously converging
  * replica (Delta's `readChangeFeed` streaming mode, composed from
  * parts this engine already has): a file-source stream over a change
  * feed directory — increments are append-only `batch_id=N`
  * partitions committed by atomic rename, exactly the append-only
  * contract a file stream needs — drives a foreachBatch that applies
  * every published increment beyond the replica's high-water mark
  * through the shared merge core onto a VERSIONED replica.
  *
  * Exactly-once at the version level: each applied feed batch commits
  * with a `(txnId, feedBatchId)` manifest marker, and the high-water
  * mark IS the replica's own manifest state ([[Versioned.lastTxn]]).
  * The streaming micro-batch is used only as a NOTIFICATION that new
  * feed files exist; the actual apply re-lists the feed's published
  * `batch_id=` partitions and reads each increment whole, so neither
  * source file chunking (maxFilesPerTrigger) nor a crash-replayed
  * micro-batch can split or double-apply an increment — a replayed
  * batch finds its marker and skips, advancing the replica's version
  * exactly once per FEED batch, ever.
  *
  * Scale shape: per-wakeup work is bounded by the UNAPPLIED feed
  * batches (a driver listing of the feed dir plus one scoped merge
  * per increment, each touching only that increment's partitions);
  * replica lake size never enters the cost. The replica must be
  * seeded (same contract as
  * [[graft.ops.MergeData.applyChangeFeed]]) — bootstrap it from the
  * primary's base snapshot, then start the stream.
  */
object StreamingReplica {

  /** List the feed's published increment ids (driver-side, one
    * listing). Staged (`_stg_`-prefixed) increments are invisible. */
  private def publishedBatches(spark: SparkSession, feedDir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(feedDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("batch_id=") =>
        n.stripPrefix("batch_id=").toLong }
      .sorted
  }

  /** Apply all published feed increments above the replica's
    * high-water mark — the same loop the stream runs per wakeup,
    * exposed for catch-up / backfill without a streaming query.
    * Returns the ids applied. */
  def applyPublished(spark: SparkSession, feedDir: String,
      replicaDir: String, partitionKeys: Seq[String], rowKey: Seq[String],
      txnId: String, afterFeedBatch: Long => Unit = _ => ()): Seq[Long] = {
    val since = Versioned.lastTxn(spark, replicaDir, txnId)
    val todo = publishedBatches(spark, feedDir).filter(_ > since)
    todo.foreach { fid =>
      // read the increment WHOLE from its committed partition (never
      // from the stream's possibly chunked file set); preimages
      // describe what a batch replaced — replay applies only
      // post-state rows
      val bPath = s"$feedDir/batch_id=$fid"
      val b0 = Versioned.uniformDirSchemaLocal(spark, bPath) match {
        case Some(s) => spark.read.schema(s).parquet(bPath)
        case None => spark.read.option("mergeSchema", "true").parquet(bPath)
      }
      val b = b0
        .filter(col("_action") =!= "update_preimage")
        .withColumn("__delete", col("_action") === "delete")
        .drop("_action")
      Versioned.mergeInto(spark, replicaDir, b, partitionKeys, rowKey,
        txn = Some((txnId, fid)))
      afterFeedBatch(fid)
    }
    todo
  }

  /** Start the continuously converging replica stream.
    *
    * @param txnId identifies this replica in its own manifest's txn
    *   markers; defaults to a stable SHA-256 prefix of the checkpoint
    *   path (same stream restarts with the same checkpoint, hence the
    *   same id).
    * @param afterFeedBatch runs after each feed increment's versioned
    *   commit lands but before the streaming log records the
    *   micro-batch — the crash window the txn markers exist for
    *   (tests throw here). */
  def start(spark: SparkSession, feedDir: String, replicaDir: String,
      partitionKeys: Seq[String], rowKey: Seq[String], checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      txnId: Option[String] = None,
      afterFeedBatch: Long => Unit = _ => ()): StreamingQuery = {
    val id = txnId.getOrElse {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(checkpoint.getBytes("UTF-8"))
      "replica-" + d.take(8).map(b => f"$b%02x").mkString
    }
    // a replica may start BEFORE the primary publishes its first
    // increment; the file source needs the path to exist
    val feedRoot = new org.apache.hadoop.fs.Path(feedDir)
    feedRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(feedRoot)
    // the notification stream: schema only needs SOMETHING stable to
    // list against — project just the partition column, so feed schema
    // evolution can never wedge the source
    val notifications = spark.readStream
      .schema(new org.apache.spark.sql.types.StructType()
        .add("batch_id", org.apache.spark.sql.types.LongType))
      .parquet(feedDir)
    notifications.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (mb: DataFrame, _: Long) =>
        applyPublished(mb.sparkSession, feedDir, replicaDir,
          partitionKeys, rowKey, id, afterFeedBatch)
        ()
      }
      .start()
  }
}
