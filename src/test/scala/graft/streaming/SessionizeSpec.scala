package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The streaming sessionizer must emit exactly the batch twin's sessions
  * once the watermark passes everything: same bounds, counts, sums —
  * including out-of-order rows inside a batch and sessions that only
  * close via event-time timeout (flushed by a later batch advancing the
  * watermark). */
class SessionizeSpec extends SparkSpec {

  private val gapUs = 1800L * 1000000L // 30 min

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("t", LongType),
    StructField("value", DoubleType)))

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      ("user_id,t,value" +: rows).mkString("\n").getBytes)
  }

  private def runOnce(root: String, out: String, ckpt: String,
      lateness: String = "10 minutes"): Unit = {
    val stream = spark.readStream.option("header", "true").schema(schema)
      .csv(root)
      .select(col("user_id"), timestamp_seconds(col("t")).as("ts"), col("value"))
    val q = Sessionize.streamSessions(stream, gapUs, lateness)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def canon(d: DataFrame): Seq[Seq[Any]] =
    rowsOf(d.select(col("user_id"), col("session_start_us"),
      col("session_end_us"), col("n_events"), round(col("sum_value"), 6))
      .orderBy("user_id", "session_start_us"))

  test("streaming sessions == batch twin after watermark flush") {
    val base = Files.createTempDirectory("graft-sess").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val t0 = 1700000000L
    // u1: [t0, t0+600] then (gap 2400s > 1800) [t0+3000, t0+3300];
    // u2: [t0+100] then [t0+2500]; rows deliberately shuffled in-file.
    val run1 = Seq(
      s"1,${t0 + 3300},4.0", s"1,$t0,1.0", s"2,${t0 + 100},10.0",
      s"1,${t0 + 600},2.0", s"1,${t0 + 3000},3.0", s"2,${t0 + 2500},20.0")
    writeCsv(root, "a.csv", run1)
    runOnce(root, out, ckpt)
    // In-data gaps alone must already close u1's and u2's first sessions.
    val emitted1 = spark.read.parquet(out)
    assert(emitted1.count() >= 2)

    // Second batch: u2's open session CONTINUES across the batch
    // boundary (t0+3500 is within gap of t0+2500 and above run1's
    // watermark), and a far-future sentinel pushes the watermark past
    // every real session's (end + gap) so event-time timeouts flush.
    writeCsv(root, "b.csv", Seq(
      s"2,${t0 + 3500},30.0", s"999,${t0 + 100000},0.0"))
    runOnce(root, out, ckpt)

    val streamed = spark.read.parquet(out).filter(col("user_id") < 999)
    val batchIn = spark.read.option("header", "true").schema(schema)
      .csv(s"$root/*.csv").filter(col("user_id") < 999)
      .select(col("user_id"), (col("t") * 1000000L).as("tsu"), col("value"))
    val batched = Sessionize.batch(batchIn, gapUs, orderCol = "tsu")
    assert(canon(streamed) === canon(batched))
    // u1 split into exactly 2 sessions, u2 into 2 (the second spanning
    // both batches: n_events 2, sum 50.0).
    assert(batched.count() === 4)
    assert(canon(streamed).exists(r => r(0) == 2L && r(3) == 2L && r(4) == 50.0))
  }

  test("a late event can bridge an in-batch gap: no eager emission") {
    // Batch 1 has a gap (2400s > 1800s) the sessionizer must NOT emit
    // eagerly: a later admissible event lands inside the gap and merges
    // everything into ONE session — append output can't retract, so
    // eager emission would diverge from the batch twin forever.
    val base = Files.createTempDirectory("graft-sess-bridge").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val t0 = 1700000000L
    writeCsv(root, "a.csv", Seq(s"1,$t0,1.0", s"1,${t0 + 2400},2.0"))
    // lateness 30 min -> watermark after run 1 = t0+600
    runOnce(root, out, ckpt, lateness = "30 minutes")
    writeCsv(root, "b.csv", Seq(s"1,${t0 + 1200},4.0")) // in-gap, above watermark
    runOnce(root, out, ckpt, lateness = "30 minutes")
    writeCsv(root, "c.csv", Seq(s"999,${t0 + 100000},0.0")) // flush
    runOnce(root, out, ckpt, lateness = "30 minutes")

    val streamed = spark.read.parquet(out).filter(col("user_id") < 999)
    assert(canon(streamed) ===
      Seq(Seq(1L, t0 * 1000000L, (t0 + 2400) * 1000000L, 3L, 7.0)))
  }

  test("checkpoint restart recovers open state; no duplicate or lost emissions") {
    // The failure mode that bites at scale: a job stops (deploy, crash,
    // preemption) with sessions OPEN in the state store and sessions
    // already emitted to the sink. On restart from the checkpoint the
    // open sessions must continue (not reset), the emitted ones must not
    // re-emit, and an idle restart (no new input) must be a clean no-op.
    val base = Files.createTempDirectory("graft-sess-restart").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val t0 = 1700000000L
    // run 1: u1 session A [t0, t0+300] closed by the in-data gap to
    // t0+3000; session B [t0+3000] stays OPEN in state at shutdown
    writeCsv(root, "a.csv", Seq(
      s"1,$t0,1.0", s"1,${t0 + 300},2.0", s"1,${t0 + 3000},4.0"))
    runOnce(root, out, ckpt)
    val emittedRun1 = spark.read.parquet(out)
    assert(canon(emittedRun1) ===
      Seq(Seq(1L, t0 * 1000000L, (t0 + 300) * 1000000L, 2L, 3.0)),
      "session A must emit in run 1, session B must stay open in state")

    // restart with NO new input: pure checkpoint recovery, no effects
    runOnce(root, out, ckpt)
    assert(canon(spark.read.parquet(out)) === canon(emittedRun1),
      "an idle restart must neither re-emit nor lose anything")

    // restart continuing session B across the stop boundary, then flush
    writeCsv(root, "b.csv", Seq(s"1,${t0 + 3600},8.0"))
    runOnce(root, out, ckpt)
    writeCsv(root, "c.csv", Seq(s"999,${t0 + 100000},0.0"))
    runOnce(root, out, ckpt)

    val streamed = spark.read.parquet(out).filter(col("user_id") < 999)
    val batchIn = spark.read.option("header", "true").schema(schema)
      .csv(s"$root/*.csv").filter(col("user_id") < 999)
      .select(col("user_id"), (col("t") * 1000000L).as("tsu"), col("value"))
    assert(canon(streamed) === canon(Sessionize.batch(batchIn, gapUs, orderCol = "tsu")))
    // session B spans the restart: one row, both events, no duplicate A
    assert(streamed.count() === streamed.distinct().count())
    assert(canon(streamed) === Seq(
      Seq(1L, t0 * 1000000L, (t0 + 300) * 1000000L, 2L, 3.0),
      Seq(1L, (t0 + 3000) * 1000000L, (t0 + 3600) * 1000000L, 2L, 12.0)))
  }
}
