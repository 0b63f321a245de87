package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.Funnel

/** The streamed funnel must emit exactly the batch twin's non-null
  * stage times once the watermark passes everything — across
  * out-of-order rows, multi-batch arrival, and a checkpointed second
  * run. */
class StreamingFunnelSpec extends SparkSpec {

  private val stages = Seq("A", "B", "C")
  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("t", LongType),
    StructField("event_type", StringType)))

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      ("user_id,t,event_type" +: rows).mkString("\n").getBytes)
  }

  private def runOnce(root: String, out: String, ckpt: String): Unit = {
    val stream = spark.readStream.option("header", "true").schema(schema)
      .csv(root)
      .select(col("user_id"), timestamp_seconds(col("t")).as("ts"),
        col("event_type"))
    val q = StreamingFunnel.streamFunnel(stream, stages, lateness = "10 minutes")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def batchTwin(rows: Seq[(Long, Long, String)]): Seq[(Long, Int, Long)] =
    Funnel.stageTimes(
        df(rows.map { case (u, t, e) => (u, t * 1000000L, e) }, "user_id", "tsu", "event_type"),
        "user_id", "tsu", "event_type", stages)
      .collect().flatMap { r =>
        (1 to stages.size).flatMap(i =>
          Option(r.get(i)).map(t => (r.getLong(0), i, t.asInstanceOf[Long])))
      }.toSeq.sorted

  test("streamed funnel == batch twin after flush, across batches and restart") {
    val base = Files.createTempDirectory("graft-sfunnel").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val t0 = 1700000000L
    // u1 full funnel out of order; u2 B-before-A stall; u3 A only —
    // then batch 2 delivers u3's B (in-order continuation) and u1 noise
    val run1 = Seq(
      (1L, t0 + 200, "B"), (1L, t0 + 100, "A"), (1L, t0 + 300, "C"),
      (2L, t0 + 50, "B"), (2L, t0 + 400, "A"),
      (3L, t0 + 100, "A"))
    val run2 = Seq(
      (3L, t0 + 900, "B"), (1L, t0 + 900, "B"))
    val flush = Seq((999L, t0 + 100000L, "A"))
    def csvRows(rs: Seq[(Long, Long, String)]) =
      rs.map { case (u, t, e) => s"$u,$t,$e" }

    writeCsv(root, "a.csv", csvRows(run1))
    runOnce(root, out, ckpt)
    writeCsv(root, "b.csv", csvRows(run2))
    runOnce(root, out, ckpt)
    writeCsv(root, "c.csv", csvRows(flush))
    runOnce(root, out, ckpt)

    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sorted
    // the flush sentinel's own A-step emits only when a LATER watermark
    // passes it — exclude user 999 from the comparison
    val expected = batchTwin(run1 ++ run2).filter(_._1 != 999L)
    assert(streamed.filter(_._1 != 999L) == expected)
    // u2 stalled at stage 1 (its B precedes its A): exactly one step
    assert(streamed.count(_._1 == 2L) == 1)
    // u1's funnel completed despite out-of-order arrival
    assert(streamed.filter(_._1 == 1L).map(_._2) == Seq(1, 2, 3))
  }
}
