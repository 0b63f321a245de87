package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.Overview

/** §7.4: the streaming overview must (a) reproduce the batch stats and
  * (b) be genuinely incremental — a second run with the same checkpoint
  * picks up only new files and the merged output stays correct. */
class StreamingOverviewSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("site", StringType), StructField("participant_id", StringType),
    StructField("metric", StringType), StructField("t", LongType)))

  private def writeCsv(dir: String, name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      ("site,participant_id,metric,t" +: rows).mkString("\n").getBytes)
  }

  private def runOnce(root: String, out: String, ckpt: String): Unit = {
    val stream = StreamingOverview.readLakeStream(spark, root, schema, glob = "*.csv")
    val partials = StreamingOverview.dailyPartials(
      stream, timestamp_seconds(col("t")), Seq("site", "participant_id", "metric"))
    val q = StreamingOverview.start(spark, partials,
      Seq("site", "participant_id", "metric"), out, ckpt)
    q.awaitTermination()
  }

  test("availableNow run == batch stats; second run merges only new files") {
    val base = Files.createTempDirectory("graft-stream").toString
    val (root, out, ckpt) = (s"$base/lake", s"$base/partials", s"$base/ckpt")
    val day0 = 1700006400L // 2023-11-15 00:00 UTC, mid-day offsets below
    writeCsv(root, "a.csv", Seq(
      s"s1,p1,hr,${day0 + 3600}", s"s1,p1,hr,${day0 + 7200}",
      s"s1,p1,hr,${day0 + 86400 + 3600}", s"s1,p2,hr,${day0 + 3600}"))
    runOnce(root, out, ckpt)

    def batchStats = Overview.stats(
      spark.read.schema(schema).option("header", "true").csv(s"$root/*.csv")
        .withColumn("ts", timestamp_seconds(col("t"))),
      Seq("site", "participant_id", "metric"), col("ts"))
    val s1 = StreamingOverview.finalStats(spark, out, Seq("site", "participant_id", "metric"))
    assert(rowsOf(s1) === rowsOf(batchStats))

    // incremental: a late file extends p1's range and adds p3
    writeCsv(root, "b.csv", Seq(
      s"s1,p1,hr,${day0 + 2 * 86400 + 3600}", s"s2,p3,steps,${day0 + 3600}"))
    runOnce(root, out, ckpt)
    val s2 = StreamingOverview.finalStats(spark, out, Seq("site", "participant_id", "metric"))
    assert(rowsOf(s2) === rowsOf(batchStats))
    assert(rowsOf(s2.select("site", "participant_id", "row_count")).contains(
      Seq("s1", "p1", 4L))) // 3 from a.csv + 1 incremental from b.csv
  }
}
