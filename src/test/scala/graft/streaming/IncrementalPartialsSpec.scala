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

  test("mixing weights maintained from streamed count increments == batch pass") {
    val base = Files.createTempDirectory("graft-ipart-mix").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    // g doubles as the source column; two arrivals shift the mix
    writeCsv(root, "a.csv", (1 to 80).map(_ => "big,1.0") ++ Seq("small,1.0"))
    val counts = (b: org.apache.spark.sql.DataFrame) =>
      b.groupBy("g").agg(count(lit(1)).cast("long").as("n"))
    val s1 = spark.readStream.option("header", "true").schema(schema).csv(root)
    IncrementalPartials.start(s1, counts, out, ckpt).awaitTermination()
    writeCsv(root, "b.csv", (1 to 19).map(_ => "small,1.0"))
    val s2 = spark.readStream.option("header", "true").schema(schema).csv(root)
    IncrementalPartials.start(s2, counts, out, ckpt).awaitTermination()

    val merged = spark.read.parquet(out)
      .groupBy("g").agg(sum("n").as("n"))
    val streamed = graft.ext.Curation
      .mixingWeightsFromCounts(merged, "g", 0.5, 50L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val batch = graft.ext.Curation.mixingWeights(
        df((1 to 80).map(_ => Tuple1("big")) ++ (1 to 20).map(_ => Tuple1("small")), "g"),
        "g", 0.5, 50L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(streamed == batch)
    assert(streamed("big")._1 == 80L && streamed("small")._1 == 20L)
  }

  test("crash after write, before commit: replayed batch never double-counts") {
    val base = Files.createTempDirectory("graft-ipart-kill").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val rows = (1 to 60).map(i => s"a,${i % 30}") ++ Seq("b,42.0")
    writeCsv(root, "a.csv", rows)
    val build = (b: org.apache.spark.sql.DataFrame) =>
      QuantileSketch.sketchPartials(b, Seq("g"), "v", lo, hi, bins)

    // attempt 1: the increment lands on disk, then the query dies
    // INSIDE the commit window — the checkpoint never records batch 0
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    val stream1 = spark.readStream.option("header", "true").schema(schema).csv(root)
    val q1 = IncrementalPartials.start(stream1, build, out, ckpt,
      afterBatch = _ =>
        if (armed.getAndSet(false))
          throw new RuntimeException("injected crash after write, before commit"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    // the dangerous state is real: the failed attempt's data IS visible
    val orphan = spark.read.parquet(out)
    assert(orphan.count() > 0, "crash landed before the write - wrong window")

    // attempt 2: restart from the same checkpoint; batch 0 REPLAYS with
    // the same id and dynamic overwrite rewrites its partition
    val stream2 = spark.readStream.option("header", "true").schema(schema).csv(root)
    IncrementalPartials.start(stream2, build, out, ckpt).awaitTermination()

    val streamed = QuantileSketch.estimate(
        spark.read.parquet(out).select("g", "bin", "bin_count"),
        Seq("g"), lo, hi, bins, qs)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val parsed = rows.map { s => val Array(g, v) = s.split(","); (g, v.toDouble) }
    val oneShot = QuantileSketch.estimate(
        QuantileSketch.sketchPartials(df(parsed, "g", "v"), Seq("g"), "v", lo, hi, bins),
        Seq("g"), lo, hi, bins, qs)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(streamed == oneShot)
    // one increment partition; total mass counted exactly once
    assert(spark.read.parquet(out).select("batch_id").distinct().count() == 1)
    val total = spark.read.parquet(out).agg(sum("bin_count")).collect()(0).getLong(0)
    assert(total == rows.size.toLong, s"double-counted: $total != ${rows.size}")
  }
}
