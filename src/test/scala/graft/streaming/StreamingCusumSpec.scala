package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The streaming CUSUM must replay the textbook recursion in event-time
  * order — including rows that arrive out of order within the watermark
  * delay, accumulators carried across incremental runs (checkpoint
  * restore), and buffered rows flushed purely by watermark advance. */
class StreamingCusumSpec extends SparkSpec {

  private val k = 0.5
  private val h = 2.0

  private val schema = StructType(Seq(
    StructField("key", LongType), StructField("t", LongType),
    StructField("z", DoubleType)))

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      ("key,t,z" +: rows).mkString("\n").getBytes)
  }

  private def runOnce(root: String, out: String, ckpt: String): Unit = {
    val stream = spark.readStream.option("header", "true").schema(schema)
      .csv(root)
      .select(col("key"), timestamp_seconds(col("t")).as("ts"), col("z"))
    val q = StreamingCusum.alarms(stream, k, h, lateness = "10 minutes")
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The textbook recursion, folded locally in (t, z) order. */
  private def refAlarms(rows: Seq[(Long, Long, Double)]): Seq[(Long, Long, String, Double)] = {
    rows.groupBy(_._1).toSeq.flatMap { case (key, rs) =>
      var (sp, sn) = (0.0, 0.0)
      rs.map(r => (r._2, r._3)).sorted.flatMap { case (t, z) =>
        sp = math.max(0.0, sp + (z - k))
        sn = math.max(0.0, sn + (-z - k))
        Seq.empty[(Long, Long, String, Double)] ++
          (if (sp > h) Seq((key, t * 1000000L, "pos", sp)) else Nil) ++
          (if (sn > h) Seq((key, t * 1000000L, "neg", sn)) else Nil)
      }
    }.sortBy(r => (r._1, r._2, r._3))
  }

  test("streamed alarms == local recursion across runs, out-of-order input") {
    val base = Files.createTempDirectory("graft-cusum").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val t0 = 1700000000L
    // key 1 drifts up (alarms fire), key 2 drifts down; rows shuffled
    // in-file; the t0+250 row for key 1 arrives in run 2 (late but
    // within the 10-min watermark delay) and must fold IN ORDER.
    val run1 = Seq(
      s"1,${t0 + 300},1.2", s"1,$t0,1.0", s"2,${t0 + 100},-1.5",
      s"1,${t0 + 100},0.9", s"2,$t0,-0.2", s"1,${t0 + 200},1.4")
    val run2 = Seq(
      s"1,${t0 + 250},1.1", s"2,${t0 + 200},-2.0", s"1,${t0 + 400},0.3",
      // sentinel far ahead: advances the watermark so every buffered
      // row above flushes even with no further traffic on its key
      s"999,${t0 + 100000},0.0")
    writeCsv(root, "r1.csv", run1)
    runOnce(root, out, ckpt)
    writeCsv(root, "r2.csv", run2)
    runOnce(root, out, ckpt)

    // raw doubles: both folds run the same ops in the same order on
    // the same JVM, so the values are bit-identical — no rounding
    val got = rowsOf(spark.read.parquet(out)
      .select(col("key"), col("tsu"), col("side"), col("s"))
      .orderBy("key", "tsu", "side"))
    val all = (run1 ++ run2).map { line =>
      val Array(kk, t, z) = line.split(","); (kk.toLong, t.toLong, z.toDouble)
    }
    val want = refAlarms(all).map { case (kk, tu, side, s) =>
      Seq[Any](kk, tu, side, s)
    }
    assert(got === want)
  }
}
