package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The stream-stream interval join must emit exactly the batch join's
  * matched pairs — across micro-batches, with out-of-order arrival
  * inside the watermark. */
class StreamingJoinSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("t", LongType)))
  private val windowSec = 100L

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), ("k,t" +: rows).mkString("\n").getBytes)
  }

  private def readStreamCsv(dir: String): DataFrame =
    spark.readStream.option("header", "true").schema(schema).csv(dir)
      .select(col("k"), timestamp_seconds(col("t")).as("ts"))

  private def runOnce(lDir: String, rDir: String, out: String, ckpt: String): Unit = {
    val q = StreamingJoin.intervalJoin(
        readStreamCsv(lDir), readStreamCsv(rDir), "k", "ts", windowSec)
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("stream-stream interval join == batch join, across batches") {
    val base = Files.createTempDirectory("graft-sjoin").toString
    val (lDir, rDir, out, ckpt) = (s"$base/l", s"$base/r", s"$base/out", s"$base/ckpt")
    val t0 = 1700000000L
    // left k=1 @ 0; right @ 50 (in window), @ 150 (outside);
    // left k=2 @ 100; right k=2 @ 90 (BEFORE left: no match), @ 180 (in)
    writeCsv(lDir, "a.csv", Seq(s"1,$t0", s"2,${t0 + 100}"))
    writeCsv(rDir, "a.csv", Seq(s"1,${t0 + 50}", s"2,${t0 + 90}"))
    runOnce(lDir, rDir, out, ckpt)
    // batch 2: late-but-admissible right rows + a flush sentinel pair
    writeCsv(rDir, "b.csv", Seq(s"1,${t0 + 150}", s"2,${t0 + 180}"))
    writeCsv(lDir, "b.csv", Seq(s"9,${t0 + 100000}"))
    writeCsv(rDir, "c.csv", Seq(s"9,${t0 + 100000}"))
    runOnce(lDir, rDir, out, ckpt)

    val got = spark.read.parquet(out)
      .filter(col("l_key") =!= 9)
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).getTime / 1000, r.getTimestamp(3).getTime / 1000))
      .toSet
    assert(got == Set(
      (1L, t0, t0 + 50),        // in-window match
      (2L, t0 + 100, t0 + 180)) // delivered in a later batch
    ) // (1, t0+150) excluded: outside window; (2, t0+90) excluded: before left
  }
}
