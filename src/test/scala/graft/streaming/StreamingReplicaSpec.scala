package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Versioned
import graft.ops.MergeData

/** Streaming change-feed source: a replica converges by streaming the
  * feed, exactly-once at the version level across restarts and an
  * injected crash, and equals the batch applyChangeFeed twin. */
class StreamingReplicaSpec extends SparkSpec {

  private def state(d: org.apache.spark.sql.DataFrame): Set[(String, Long, Double)] =
    d.select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed replica == batch feed replay; versions advance once per feed batch; crash-safe") {
    val root = java.nio.file.Files.createTempDirectory("graft_streplica").toFile
    root.deleteOnExit()
    val primary = new java.io.File(root, "primary").getAbsolutePath
    val feed = new java.io.File(root, "feed").getAbsolutePath
    val replica = new java.io.File(root, "replica").getAbsolutePath
    val replicaB = new java.io.File(root, "replicaB").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath

    val base = df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0)),
      "site", "id", "v")
    MergeData.writeMerged(spark, base, primary, keys = Seq("site"))
    Versioned.init(spark, primary)
    MergeData.writeMerged(spark, base, replica, keys = Seq("site"))
    MergeData.writeMerged(spark, base, replicaB, keys = Seq("site"))

    def publish(batchId: Long, rows: Seq[(String, Long, Double, Boolean)]): Unit =
      Versioned.mergeInto(spark, primary,
        df(rows, "site", "id", "v", "__delete"),
        Seq("site"), Seq("site", "id"), changeFeed = Some((feed, batchId)))

    publish(0L, Seq(("a", 1L, 100.0, false), ("c", 7L, 7.0, false)))
    publish(1L, Seq(("a", 2L, 0.0, true), ("b", 10L, 11.0, false)))

    // first run: both published increments applied, in order
    StreamingReplica.start(spark, feed, replica, Seq("site"),
      Seq("site", "id"), ckpt).awaitTermination()
    assert(state(Versioned.snapshot(spark, replica)) ==
      state(Versioned.snapshot(spark, primary)))
    // v0 = init, then exactly one version per feed batch
    assert(Versioned.currentVersion(spark, replica) == 2L)

    // re-running with nothing new advances nothing
    StreamingReplica.start(spark, feed, replica, Seq("site"),
      Seq("site", "id"), ckpt).awaitTermination()
    assert(Versioned.currentVersion(spark, replica) == 2L)

    // a new increment lands; the replica's NEXT run crashes after the
    // versioned commit but before the streaming log records it
    publish(2L, Seq(("c", 7L, 70.0, false), ("a", 1L, 0.0, true)))
    val crashed = StreamingReplica.start(spark, feed, replica, Seq("site"),
      Seq("site", "id"), ckpt,
      afterFeedBatch = _ => throw new RuntimeException("injected crash"))
    intercept[Exception] { crashed.awaitTermination() }
    assert(Versioned.currentVersion(spark, replica) == 3L,
      "the crashed run's commit landed before the crash")

    // restart: the replayed micro-batch finds the txn marker and does
    // NOT advance the version again
    StreamingReplica.start(spark, feed, replica, Seq("site"),
      Seq("site", "id"), ckpt).awaitTermination()
    assert(Versioned.currentVersion(spark, replica) == 3L)
    assert(state(Versioned.snapshot(spark, replica)) ==
      state(Versioned.snapshot(spark, primary)))
    // explicit expected state: batch1 deleted a2, batch2 deleted a1
    assert(state(Versioned.snapshot(spark, replica)) ==
      Set(("b", 10L, 11.0), ("c", 7L, 70.0)))

    // the streamed replica equals the batch twin byte-for-semantics
    MergeData.applyChangeFeed(spark, feed, replicaB, Seq("site"), Seq("site", "id"))
    assert(state(spark.read.parquet(replicaB)) ==
      state(Versioned.snapshot(spark, replica)))

    // and the replica's own history time-travels per feed batch
    assert(state(Versioned.snapshot(spark, replica, 1L)) ==
      Set(("a", 1L, 100.0), ("a", 2L, 2.0), ("b", 10L, 10.0), ("c", 7L, 7.0)))

    // a MERGE-ON-READ delete on the primary publishes its deleted rows
    // as a feed increment; the streaming replica consumes it as an
    // ordinary delete batch — the MOR primary and the physically
    // rewritten replica converge to the same state
    Versioned.deleteWhere(spark, primary, col("id") === 10L,
      Seq("site", "id"), changeFeed = Some((feed, 3L)))
    StreamingReplica.start(spark, feed, replica, Seq("site"),
      Seq("site", "id"), ckpt).awaitTermination()
    assert(Versioned.deleteFilesAt(spark, primary).nonEmpty,
      "primary stays merge-on-read")
    assert(state(Versioned.snapshot(spark, replica)) ==
      state(Versioned.snapshot(spark, primary)))
    assert(state(Versioned.snapshot(spark, replica)) ==
      Set(("c", 7L, 70.0)))
    assert(Versioned.currentVersion(spark, replica) == 4L)
  }

  test("end-to-end streaming CDC chain: stream -> versioned primary (CDF out) -> feed stream -> replica") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdcchain").toFile
    root.deleteOnExit()
    def p(n: String) = new java.io.File(root, n).getAbsolutePath
    val (in, primary, feed, replica) = (p("in"), p("primary"), p("feed"), p("replica"))

    val base = df(Seq(("a", 1L, 1.0), ("b", 10L, 10.0)), "site", "id", "v")
    MergeData.writeMerged(spark, base, primary, keys = Seq("site"))
    Versioned.init(spark, primary)
    MergeData.writeMerged(spark, base, replica, keys = Seq("site"))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("site",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("__delete",
        org.apache.spark.sql.types.BooleanType)))
    def writeWave(name: String, rows: Seq[(String, Long, Double, Boolean)]): Unit = {
      new java.io.File(in).mkdirs()
      val tmp = new java.io.File(in, s".$name.tmp")
      val w = new java.io.PrintWriter(tmp)
      try rows.foreach { case (s, i, v, d) => w.println(s"$s,$i,$v,$d") }
      finally w.close()
      tmp.renameTo(new java.io.File(in, name))
    }
    def runChain(): Unit = {
      StreamingMerge.startVersioned(
        spark.readStream.schema(schema).csv(in), primary,
        Seq("site"), Seq("site", "id"), p("ckpt_primary"),
        changeDir = Some(feed)).awaitTermination()
      StreamingReplica.start(spark, feed, replica, Seq("site"),
        Seq("site", "id"), p("ckpt_replica")).awaitTermination()
    }

    writeWave("w0.csv", Seq(("a", 1L, 100.0, false), ("c", 7L, 7.0, false)))
    runChain()
    assert(state(Versioned.snapshot(spark, replica)) ==
      state(Versioned.snapshot(spark, primary)))
    assert(state(Versioned.snapshot(spark, replica)) ==
      Set(("a", 1L, 100.0), ("b", 10L, 10.0), ("c", 7L, 7.0)))

    // second wave, incremental end to end — including a delete
    writeWave("w1.csv", Seq(("b", 10L, 0.0, true), ("c", 7L, 77.0, false)))
    runChain()
    assert(state(Versioned.snapshot(spark, replica)) ==
      state(Versioned.snapshot(spark, primary)))
    assert(state(Versioned.snapshot(spark, replica)) ==
      Set(("a", 1L, 100.0), ("c", 7L, 77.0)))
    // both lakes carry exactly one version per micro-batch wave
    assert(Versioned.currentVersion(spark, primary) == 2L)
    assert(Versioned.currentVersion(spark, replica) == 2L)
  }
}
