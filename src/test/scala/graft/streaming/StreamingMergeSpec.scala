package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.MergeData

/** Streamed CDC-apply must equal the same batches applied with batch
  * mergeInto — including across an incremental second run (new files
  * only) and a crash injected between the merge landing and the
  * streaming commit (replay must converge, not double-apply). */
class StreamingMergeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("site", StringType), StructField("id", LongType),
    StructField("v", DoubleType), StructField("__delete", BooleanType)))

  private def mkDirs(): (String, String, String) = {
    val root = Files.createTempDirectory("graft_smerge").toFile
    root.deleteOnExit()
    (new File(root, "lake").getAbsolutePath,
      new File(root, "in").getAbsolutePath,
      new File(root, "ckpt").getAbsolutePath)
  }

  private def seedBase(lake: String): Unit =
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0)),
        "site", "id", "v"),
      lake, keys = Seq("site"))

  private def writeBatch(in: String, name: String,
      rows: Seq[(String, Long, Double, Boolean)]): Unit = {
    new File(in).mkdirs()
    val tmp = new File(in, s".$name.tmp")
    val w = new java.io.PrintWriter(tmp)
    try rows.foreach { case (s, i, v, d) => w.println(s"$s,$i,$v,$d") }
    finally w.close()
    // atomic-ish rename so the file source never reads a half file
    tmp.renameTo(new File(in, name))
  }

  private def runOnce(lake: String, in: String, ckpt: String,
      afterBatch: Long => Unit = _ => (),
      changeDir: Option[String] = None): Unit = {
    val stream = spark.readStream.schema(schema).csv(in)
    val q = StreamingMerge.start(stream, lake, Seq("site"), Seq("site", "id"),
      ckpt, afterBatch = afterBatch, changeDir = changeDir)
    try q.awaitTermination()
    finally if (q.isActive) q.stop()
  }

  private def state(lake: String): Set[(String, Long, Double)] =
    spark.read.parquet(lake).select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed merges across two incremental runs equal the batch result") {
    val (lake, in, ckpt) = mkDirs()
    seedBase(lake)
    writeBatch(in, "b1.csv", Seq(
      ("a", 1L, 100.0, false), ("a", 2L, 0.0, true), ("c", 7L, 7.0, false)))
    runOnce(lake, in, ckpt)
    assert(state(lake) == Set(
      ("a", 1L, 100.0), ("b", 10L, 10.0), ("c", 7L, 7.0)))

    // second run discovers ONLY the new file (checkpointed listing)
    writeBatch(in, "b2.csv", Seq(
      ("a", 1L, 200.0, false), ("b", 10L, 0.0, true), ("b", 11L, 11.0, false)))
    runOnce(lake, in, ckpt)
    assert(state(lake) == Set(
      ("a", 1L, 200.0), ("b", 11L, 11.0), ("c", 7L, 7.0)))
  }

  test("streamed change feed replicates the lake batch-for-batch") {
    val (lake, in, ckpt) = mkDirs()
    val feed = new File(new File(lake).getParentFile, "feed").getAbsolutePath
    val replica = new File(new File(lake).getParentFile, "replica").getAbsolutePath
    seedBase(lake)
    seedBase(replica)
    writeBatch(in, "b1.csv", Seq(
      ("a", 1L, 100.0, false), ("a", 2L, 0.0, true), ("c", 7L, 7.0, false)))
    runOnce(lake, in, ckpt, changeDir = Some(feed))
    writeBatch(in, "b2.csv", Seq(
      ("c", 7L, 70.0, false), ("b", 10L, 0.0, true)))
    runOnce(lake, in, ckpt, changeDir = Some(feed))
    // two micro-batches → two batch_id increments, each carrying the
    // Delta row classes; replaying them converges the replica
    val ids = spark.read.parquet(feed).select("batch_id").distinct().count()
    assert(ids == 2)
    MergeData.applyChangeFeed(spark, feed, replica, Seq("site"), Seq("site", "id"))
    assert(state(replica) == state(lake))
    assert(state(replica) == Set(("a", 1L, 100.0), ("c", 7L, 70.0)))
  }

  test("versioned streaming: manifest history accumulates; crash-replay does NOT advance the version") {
    val (lake, in, ckpt) = mkDirs()
    val feed = new File(new File(lake).getParentFile, "vfeed").getAbsolutePath
    seedBase(lake)
    graft.lake.Versioned.init(spark, lake)
    def runVersioned(afterBatch: Long => Unit = _ => ()): Unit = {
      val stream = spark.readStream.schema(schema).csv(in)
      val q = StreamingMerge.startVersioned(stream, lake,
        Seq("site"), Seq("site", "id"), ckpt, afterBatch = afterBatch,
        changeDir = Some(feed))
      try q.awaitTermination()
      finally if (q.isActive) q.stop()
    }
    def snapState(v: Long): Set[(String, Long, Double)] =
      graft.lake.Versioned.snapshot(spark, lake, v)
        .select("site", "id", "v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    writeBatch(in, "b1.csv", Seq(
      ("a", 1L, 100.0, false), ("a", 2L, 0.0, true), ("c", 7L, 7.0, false)))
    runVersioned()
    assert(graft.lake.Versioned.currentVersion(spark, lake) == 1L)
    assert(snapState(1L) == Set(
      ("a", 1L, 100.0), ("b", 10L, 10.0), ("c", 7L, 7.0)))

    // second batch crashes AFTER its versioned commit (v2) but before
    // the streaming log records it
    writeBatch(in, "b2.csv", Seq(("c", 7L, 70.0, false)))
    intercept[Exception] {
      runVersioned(afterBatch = _ => throw new RuntimeException("injected crash"))
    }
    assert(graft.lake.Versioned.currentVersion(spark, lake) == 2L)
    // restart replays b2: the (txnId, batchId) manifest marker makes
    // the replay a no-op — the version does NOT advance twice
    runVersioned()
    assert(graft.lake.Versioned.currentVersion(spark, lake) == 2L,
      "replayed batch must not commit a second version")
    assert(snapState(2L) == Set(
      ("a", 1L, 100.0), ("b", 10L, 10.0), ("c", 7L, 70.0)))
    // and the stream's full history time-travels: v1 still intact
    assert(snapState(1L) == Set(
      ("a", 1L, 100.0), ("b", 10L, 10.0), ("c", 7L, 7.0)))

    // the versioned path emitted one write-once CDF increment per
    // micro-batch (the replayed batch kept its original increment)
    val ids = spark.read.parquet(feed).select("batch_id").distinct()
      .collect().map(_.getAs[Number](0).longValue()).toSet
    assert(ids == Set(0L, 1L))

    // streamed versioned lake == the same batches applied with batch
    // Versioned.mergeInto on a twin lake
    val twin = new File(new File(lake).getParentFile, "twin").getAbsolutePath
    seedBase(twin)
    graft.lake.Versioned.init(spark, twin)
    graft.lake.Versioned.mergeInto(spark, twin,
      df(Seq(("a", 1L, 100.0, false), ("a", 2L, 0.0, true), ("c", 7L, 7.0, false)),
        "site", "id", "v", "__delete"), Seq("site"), Seq("site", "id"))
    graft.lake.Versioned.mergeInto(spark, twin,
      df(Seq(("c", 7L, 70.0, false)), "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"))
    def twinState(v: Long): Set[(String, Long, Double)] =
      graft.lake.Versioned.snapshot(spark, twin, v)
        .select("site", "id", "v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(graft.lake.Versioned.currentVersion(spark, twin) == 2L)
    (1L to 2L).foreach(v => assert(twinState(v) == snapState(v)))
  }

  test("crash between merge and commit: replay converges to the same state") {
    val (lake, in, ckpt) = mkDirs()
    seedBase(lake)
    writeBatch(in, "b1.csv", Seq(
      ("a", 1L, 100.0, false), ("a", 2L, 0.0, true), ("c", 7L, 7.0, false)))
    // the merge lands, then the commit "crashes" — the streaming log
    // never records the batch
    intercept[Exception] {
      runOnce(lake, in, ckpt,
        afterBatch = _ => throw new RuntimeException("injected crash"))
    }
    val afterCrash = state(lake)
    assert(afterCrash == Set(("a", 1L, 100.0), ("b", 10L, 10.0), ("c", 7L, 7.0)),
      "merge itself landed before the crash")
    // restart replays the same batch; idempotence must hold the state
    runOnce(lake, in, ckpt)
    assert(state(lake) == afterCrash)
  }

  test("streamed APPEND ingest: one versioned append commit per batch; crash-replay skipped; appendsBetween sees exactly the streamed rows") {
    val (lake, in, ckpt) = mkDirs()
    seedBase(lake)
    graft.lake.Versioned.init(spark, lake)
    val appendSchema = StructType(Seq(
      StructField("site", StringType), StructField("id", LongType),
      StructField("v", DoubleType)))
    def writeRows(name: String, rows: Seq[(String, Long, Double)]): Unit = {
      new File(in).mkdirs()
      val tmp = new File(in, s".$name.tmp")
      val w = new java.io.PrintWriter(tmp)
      try rows.foreach { case (s0, i, v) => w.println(s"$s0,$i,$v") }
      finally w.close()
      tmp.renameTo(new File(in, name))
    }
    def runAppend(afterBatch: Long => Unit = _ => ()): Unit = {
      val q = StreamingMerge.startAppend(
        spark.readStream.schema(appendSchema).csv(in), lake,
        Seq("site"), ckpt, afterBatch = afterBatch)
      try q.awaitTermination()
      finally if (q.isActive) q.stop()
    }
    def snap(): Set[(String, Long, Double)] =
      graft.lake.Versioned.snapshot(spark, lake)
        .select("site", "id", "v").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    writeRows("a1.csv", Seq(("a", 50L, 5.0), ("b", 60L, 6.0)))
    runAppend()
    assert(graft.lake.Versioned.currentVersion(spark, lake) == 1L)
    assert(snap() == Set(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0),
      ("a", 50L, 5.0), ("b", 60L, 6.0)))

    // crash AFTER the append commit (v2), before the streaming record
    writeRows("a2.csv", Seq(("c", 70L, 7.0)))
    intercept[Exception] {
      runAppend(afterBatch = _ => throw new RuntimeException("injected crash"))
    }
    assert(graft.lake.Versioned.currentVersion(spark, lake) == 2L)
    // replay: the (txnId, batchId) marker skips — no version, no dupes
    runAppend()
    assert(graft.lake.Versioned.currentVersion(spark, lake) == 2L,
      "replayed append batch must not commit a second version")
    assert(snap().count(_._1 == "c") == 1)

    // the streamed commits ARE an append-only range: a follower reads
    // exactly the streamed rows from the manifests
    val added = graft.lake.Versioned.appendsBetween(spark, lake, 0L, 2L)
      .select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(added == Set(("a", 50L, 5.0), ("b", 60L, 6.0), ("c", 70L, 7.0)))
  }
}
