package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.ThetaSketch

/** The streamed sketch (re-sketch of per-batch increments) must equal
  * the one-shot batch sketch over the same rows, including across runs
  * sharing a checkpoint, and must compose with setOps. */
class StreamingThetaSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("key", StringType)))
  private val k = 32

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), ("key" +: rows).mkString("\n").getBytes)
  }

  private def runOnce(root: String, out: String, ckpt: String): Unit = {
    val stream = spark.readStream.option("header", "true").schema(schema).csv(root)
    StreamingTheta.start(stream, "key", k, out, ckpt).awaitTermination()
  }

  test("streamed increments re-sketch to the batch sketch, across runs") {
    val base = Files.createTempDirectory("graft-stheta").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val batch1 = (1 to 60).map(i => s"k$i")
    val batch2 = (40 to 90).map(i => s"k$i") // overlap + new keys
    writeCsv(root, "a.csv", batch1)
    runOnce(root, out, ckpt)
    writeCsv(root, "b.csv", batch2)
    runOnce(root, out, ckpt) // picks up only b.csv

    val streamed = StreamingTheta.sketch(spark, out, k)
    val batchSk = ThetaSketch.kmv(
      df((batch1 ++ batch2).map(Tuple1(_)), "key"), col("key"), k)
    assert(rowsOf(streamed.orderBy("h")) === rowsOf(batchSk.orderBy("h")))

    // setOps over two streamed sketches == batch setOps
    val out2 = s"$base/out2"
    val ckpt2 = s"$base/ckpt2"
    val root2 = s"$base/in2"
    writeCsv(root2, "c.csv", (70 to 120).map(i => s"k$i"))
    val stream2 = spark.readStream.option("header", "true").schema(schema).csv(root2)
    StreamingTheta.start(stream2, "key", k, out2, ckpt2).awaitTermination()
    val s2 = StreamingTheta.sketch(spark, out2, k)
    val est = ThetaSketch.setOps(spark, streamed, s2, k).collect()(0)
    val bs2 = ThetaSketch.kmv(
      df((70 to 120).map(i => Tuple1(s"k$i")), "key"), col("key"), k)
    val expected = ThetaSketch.setOps(spark, batchSk, bs2, k).collect()(0)
    assert(est.toSeq === expected.toSeq)
  }
}
