package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.QuantileSketch

/** The generic increment pattern must give any additive partial a
  * streaming twin: streamed quantile-sketch increments merged at read
  * == one batch sketch over the union. */
class IncrementalPartialsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("v", DoubleType)))
  private val (lo, hi, bins) = (0.0, 100.0, 50)
  private val qs = Seq("p50" -> 0.5, "p90" -> 0.9)

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), ("g,v" +: rows).mkString("\n").getBytes)
  }

  test("streamed quantile-sketch increments == one-shot batch sketch") {
    val base = Files.createTempDirectory("graft-ipart").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val batch1 = (1 to 40).map(i => s"a,${i % 25}") ++ Seq("b,10.0")
    val batch2 = (1 to 30).map(i => s"a,${50 + i % 20}") ++ Seq("b,90.0")
    writeCsv(root, "a.csv", batch1)
    val stream1 = spark.readStream.option("header", "true").schema(schema).csv(root)
    IncrementalPartials.start(stream1,
      b => QuantileSketch.sketchPartials(b, Seq("g"), "v", lo, hi, bins),
      out, ckpt).awaitTermination()
    writeCsv(root, "b.csv", batch2)
    val stream2 = spark.readStream.option("header", "true").schema(schema).csv(root)
    IncrementalPartials.start(stream2,
      b => QuantileSketch.sketchPartials(b, Seq("g"), "v", lo, hi, bins),
      out, ckpt).awaitTermination()

    val streamed = QuantileSketch.estimate(
        spark.read.parquet(out).select("g", "bin", "bin_count"),
        Seq("g"), lo, hi, bins, qs)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    val allRows = (batch1 ++ batch2).map { s =>
      val Array(g, v) = s.split(","); (g, v.toDouble)
    }
    val oneShot = QuantileSketch.estimate(
        QuantileSketch.sketchPartials(df(allRows, "g", "v"), Seq("g"), "v", lo, hi, bins),
        Seq("g"), lo, hi, bins, qs)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    assert(streamed == oneShot)
    assert(streamed.keySet == Set("a", "b"))
    // two increments on disk, none double-counted
    assert(spark.read.parquet(out).select("batch_id").distinct().count() == 2)
  }
}
