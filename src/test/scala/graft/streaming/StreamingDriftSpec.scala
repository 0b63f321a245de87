package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.Drift

/** The streamed drift report (sum of per-batch bin increments vs a
  * frozen reference) must equal the batch operator over the same rows,
  * including across runs sharing a checkpoint. */
class StreamingDriftSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("v", LongType)))

  private def writeCsv(dir: String, name: String, rows: Seq[(String, Long)]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      ("g,v" +: rows.map { case (g, v) => s"$g,$v" }).mkString("\n").getBytes)
  }

  test("streamed report equals the batch drift over the same rows") {
    val base = Files.createTempDirectory("graft-sdrift").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val batch1 = (1 to 40).map(i => ("g1", (i % 5).toLong))
    val batch2 = (1 to 30).map(i => ("g1", (i % 3).toLong)) // shifted mix
    writeCsv(root, "a.csv", batch1)
    val stream1 = spark.readStream.option("header", "true").schema(schema).csv(root)
    StreamingDrift.start(stream1, "g", col("v"), out, ckpt).awaitTermination()
    writeCsv(root, "b.csv", batch2)
    val stream2 = spark.readStream.option("header", "true").schema(schema).csv(root)
    StreamingDrift.start(stream2, "g", col("v"), out, ckpt).awaitTermination()

    // frozen reference: uniform 8 rows over bins 0..4
    val reference = df((0L to 4L).map(b => ("g1", b, 8L)), "g", "bin", "n")
    val got = StreamingDrift.report(spark, out, "g", reference).collect()(0)

    // batch twin: same rows tagged A, reference expanded to rows tagged B
    val aRows = (batch1 ++ batch2).map { case (g, v) => (g, v, true) }
    val bRows = (0L to 4L).flatMap(b => Seq.fill(8)(("g1", b, false)))
    val batchDf = df(aRows ++ bRows, "g", "bin", "ia")
    val want = Drift.histogramDrift(batchDf, "g", "bin", col("ia")).collect()(0)
    assert(got.toSeq === want.toSeq)
    assert(got.getAs[Long]("na") === 70L)
    assert(got.getAs[Long]("tv_bp") > 0L) // the shifted mix is visible
  }
}
