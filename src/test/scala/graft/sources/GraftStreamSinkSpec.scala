package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.lake.Versioned

/** The streaming write surface: `writeStream.format("graft")` commits
  * each micro-batch as one txn-marked versioned append — exactly-once
  * across engine restarts and raw addBatch replays. */
class GraftStreamSinkSpec extends SparkSpec {

  private def state(d: DataFrame): Set[(String, Long, Double)] =
    d.select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private val schema = StructType(Seq(
    StructField("site", StringType), StructField("id", LongType),
    StructField("v", DoubleType)))

  test("writeStream.format(graft): waves commit versioned appends; restarts don't duplicate; replayed batches are no-ops") {
    val root = java.nio.file.Files.createTempDirectory("graft_sink").toFile
    root.deleteOnExit()
    val srcDir = new java.io.File(root, "src").getAbsolutePath
    val lake = new java.io.File(root, "lake").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    val spark0 = spark
    import spark0.implicits._

    def wave(rows: Seq[(String, Long, Double)], name: String): Unit =
      rows.toDF("site", "id", "v").repartition(1)
        .write.json(s"$srcDir/$name")
    def run(): Unit = {
      val in = spark.readStream.schema(schema)
        .json(s"$srcDir/*") // glob over the wave dirs
      in.writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .option("partitionKeys", "site")
        .trigger(Trigger.AvailableNow())
        .start(lake).awaitTermination()
    }

    wave(Seq(("a", 1L, 1.0), ("b", 10L, 10.0)), "w1")
    run()
    assert(state(Versioned.snapshot(spark, lake)) ==
      Set(("a", 1L, 1.0), ("b", 10L, 10.0)))
    val v1 = Versioned.currentVersion(spark, lake)

    // second wave through a RESTARTED query (same checkpoint)
    wave(Seq(("a", 2L, 2.0)), "w2")
    run()
    assert(state(Versioned.snapshot(spark, lake)) ==
      Set(("a", 1L, 1.0), ("b", 10L, 10.0), ("a", 2L, 2.0)))
    // a restart with NO new data commits nothing
    val vQuiet = Versioned.currentVersion(spark, lake)
    run()
    assert(Versioned.currentVersion(spark, lake) == vQuiet,
      "an idle restart must not commit")
    // the first wave still time-travels
    assert(state(Versioned.snapshot(spark, lake, v1)) ==
      Set(("a", 1L, 1.0), ("b", 10L, 10.0)))

    // raw replay at the sink level: the same (txn, batchId) twice
    // commits once — the crash-between-commit-and-checkpoint window
    val sink = new GraftStreamSink(spark.sqlContext, lake,
      Some(Seq("site")), "graft-sink:" + ckpt)
    val extra = Seq(("c", 30L, 30.0)).toDF("site", "id", "v")
    val vPre = Versioned.currentVersion(spark, lake)
    sink.addBatch(999L, extra)
    assert(Versioned.currentVersion(spark, lake) == vPre + 1)
    sink.addBatch(999L, extra) // replay
    assert(Versioned.currentVersion(spark, lake) == vPre + 1,
      "a replayed batch id must not commit twice")
    assert(state(Versioned.snapshot(spark, lake))
      .count(_._1 == "c") == 1)
  }
}
