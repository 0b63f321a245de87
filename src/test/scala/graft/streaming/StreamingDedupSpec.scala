package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Streamed dedup must keep exactly the batch-distinct key set when
  * duplicates arrive within the watermark — including across
  * micro-batches. */
class StreamingDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_hash", StringType), StructField("t", LongType),
    StructField("text", StringType)))

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      ("doc_hash,t,text" +: rows).mkString("\n").getBytes)
  }

  private def runOnce(root: String, out: String, ckpt: String): Unit = {
    val stream = spark.readStream.option("header", "true").schema(schema)
      .csv(root)
      .select(col("doc_hash"), timestamp_seconds(col("t")).as("ts"), col("text"))
    val q = StreamingDedup.dedupStream(stream, "ts", Seq("doc_hash"),
        lateness = "10 minutes")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("duplicates within watermark dedup exactly, across batches") {
    val base = Files.createTempDirectory("graft-sdedup").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val t0 = 1700000000L
    writeCsv(root, "a.csv", Seq(
      s"h1,$t0,alpha", s"h2,${t0 + 10},beta", s"h1,${t0 + 20},alpha"))
    runOnce(root, out, ckpt)
    // second batch: h2 repeats (still within watermark state), h3 is new
    writeCsv(root, "b.csv", Seq(
      s"h2,${t0 + 30},beta", s"h3,${t0 + 40},gamma"))
    runOnce(root, out, ckpt)

    val got = spark.read.parquet(out)
    assert(rowsOf(got.select("doc_hash").orderBy("doc_hash")) ===
      Seq(Seq("h1"), Seq("h2"), Seq("h3")))
    // first-seen text survives for the deduped key
    assert(got.filter(col("doc_hash") === "h2").head().getAs[String]("text") === "beta")
  }

  test("stream vs history: history copies never emit, stream dedups itself") {
    val base = Files.createTempDirectory("graft-sdedup-hist").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val t0 = 1700000000L
    writeCsv(root, "a.csv", Seq(
      s"x,$t0,seen before",        // exact text already in history
      s"x,${t0 + 10},brand new",   // novel
      s"x,${t0 + 20},twice",       // in-stream dup pair
      s"x,${t0 + 30},twice"))
    val history = df(Seq(Tuple1("seen before"), Tuple1("old other")), "text")
      .select(md5(col("text").cast("binary")).as("fp"))
    def runOnceVsHistory(): Unit = {
      val stream = spark.readStream.option("header", "true").schema(schema)
        .csv(root)
        .select(timestamp_seconds(col("t")).as("ts"), col("text"))
      val q = StreamingDedup.dedupStreamVsHistory(stream, history, "ts", "text",
          lateness = "10 minutes")
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnceVsHistory()
    assert(rowsOf(spark.read.parquet(out).select("text").orderBy("text")) ===
      Seq(Seq("brand new"), Seq("twice")))

    // second micro-batch: another history copy + a repeat of an
    // already-emitted stream doc (state survives the restart) + a
    // genuinely new doc — only the new doc may emit
    writeCsv(root, "b.csv", Seq(
      s"x,${t0 + 40},old other",
      s"x,${t0 + 50},brand new",
      s"x,${t0 + 60},second wave"))
    runOnceVsHistory()
    assert(rowsOf(spark.read.parquet(out).select("text").orderBy("text")) ===
      Seq(Seq("brand new"), Seq("second wave"), Seq("twice")))
  }
}
