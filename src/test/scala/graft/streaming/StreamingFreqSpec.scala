package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.FreqSketch

/** The streamed sketch (union of per-batch increments) must equal the
  * one-shot batch sketch over the same rows — including across
  * separate runs sharing a checkpoint (incremental pickup). */
class StreamingFreqSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("w", StringType)))
  private val (width, depth) = (256, 3)

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), ("w" +: rows).mkString("\n").getBytes)
  }

  private def runOnce(root: String, out: String, ckpt: String): Unit = {
    val stream = spark.readStream.option("header", "true").schema(schema).csv(root)
    val q = StreamingFreq.start(stream, "w", width, depth, out, ckpt)
    q.awaitTermination()
  }

  test("streamed increments merge to the batch sketch, across runs") {
    val base = Files.createTempDirectory("graft-sfreq").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    writeCsv(root, "a.csv", Seq.fill(30)("x") ++ Seq.fill(5)("y"))
    runOnce(root, out, ckpt)
    // a later run picks up only the new file; increments accumulate
    writeCsv(root, "b.csv", Seq.fill(20)("x") ++ Seq.fill(7)("z"))
    runOnce(root, out, ckpt)

    val allRows = Seq.fill(50)("x") ++ Seq.fill(5)("y") ++ Seq.fill(7)("z")
    val batchDf = df(allRows.map(Tuple1(_)), "w")
    val probes = batchDf.select("w").distinct()

    val streamed = StreamingFreq.estimates(spark, out, probes, "w", width, depth)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = FreqSketch.estimate(
        FreqSketch.sketchPartials(batchDf, "w", width, depth),
        probes, "w", width, depth)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == oneShot)
    // and at this width/cardinality the sketch is exact
    assert(streamed == Map("x" -> 50L, "y" -> 5L, "z" -> 7L))
    // two increments materialized, none double-counted
    assert(spark.read.parquet(out).select("batch_id").distinct().count() == 2)
  }
}
