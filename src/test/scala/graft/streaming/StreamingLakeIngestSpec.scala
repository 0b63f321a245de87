package graft.streaming

import java.io.{BufferedWriter, File, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.lake.{PathModel, Readers}
import graft.ops.Overview

/** Streaming lake ingestion (the q44 batch walk's streaming twin) must
  * parse lineage from PATHS via the same PathModel expressions as the
  * batch inventory, apply the same exclude pruning, and converge to the
  * batch overview stats — including across an incremental second run
  * that discovers only the newly-landed files. */
class StreamingLakeIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("timestamp", LongType), StructField("value", DoubleType)))
  private val keys = Seq("site", "participant_id", "metric")
  private val day0 = 1700006400L // 2023-11-15 00:00 UTC

  private def writeGz(f: File, rows: Seq[(Long, Double)]): Unit = {
    f.getParentFile.mkdirs()
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new java.io.FileOutputStream(f)), StandardCharsets.UTF_8))
    try {
      w.write("timestamp,value\n")
      rows.foreach { case (t, v) => w.write(s"$t,$v\n") }
    } finally w.close()
  }

  private def mkLake(root: String): Unit = {
    writeGz(new File(root, "raw/site_0/p0/hr/20231115_0000.csv.gz"),
      Seq((day0 + 3600, 61.0), (day0 + 7200, 62.0)))
    // shard suffix (S3) in the same (site, participant, metric) window
    writeGz(new File(root, "raw/site_0/p0/hr/20231115_0001_1.csv.gz"),
      Seq((day0 + 10800, 63.0)))
    writeGz(new File(root, "raw/site_1/p1/steps/20231116_0000.csv.gz"),
      Seq((day0 + 86400 + 3600, 900.0)))
    // excluded site: must be invisible to both modes
    writeGz(new File(root, "raw/site_2/p2/hr/20231115_0000.csv.gz"),
      Seq((day0 + 3600, 99.0)))
    // malformed filename: parsePaths must drop it in both modes
    writeGz(new File(root, "raw/site_0/p0/hr/not-a-timestamp.csv.gz"),
      Seq((day0 + 3600, 1.0)))
  }

  private def batchStats(root: String) = {
    val listed = PathModel.listFiles(spark, root)
      .withColumn("path", regexp_replace(col("path"), "^file:/+", "/"))
    val inv = PathModel.includeExclude(
      PathModel.parsePaths(listed, root), Nil, Seq("site_2"))
    val paths = inv.select("path").collect().map(_.getString(0)).toSeq
    val data = Readers.csvGz(spark, paths, Some(schema))
      .withColumn("path", regexp_replace(input_file_name(), "^file:/+", "/"))
      .join(inv.select("path", keys: _*), "path")
    Overview.stats(data, keys, Readers.eventTime(data))
  }

  private def runOnce(root: String, out: String, ckpt: String): Unit = {
    val stream = StreamingOverview.readLakeStreamWithLineage(
      spark, root, schema, exclude = Seq("site_2"))
    val partials = StreamingOverview.dailyPartials(
      stream, Readers.eventTime(stream), keys)
    StreamingOverview.start(spark, partials, keys, out, ckpt).awaitTermination()
  }

  test("path-lineage stream == batch lake overview, incl. incremental files") {
    val base = Files.createTempDirectory("graft-lake-ingest").toString
    val (root, out, ckpt) = (s"$base/lake", s"$base/partials", s"$base/ckpt")
    mkLake(root)
    runOnce(root, out, ckpt)
    val s1 = StreamingOverview.finalStats(spark, out, keys)
    assert(rowsOf(s1) === rowsOf(batchStats(root)))
    // exclusion + malformed-name drop actually happened
    assert(!rowsOf(s1.select("site")).flatten.contains("site_2"))
    assert(rowsOf(s1.filter(col("site") === "site_0")
      .select("row_count")) === Seq(Seq(3L)))

    // a new participant file lands; only it is read on the second run,
    // and the merged partials still equal the full batch walk
    writeGz(new File(root, "raw/site_1/p3/hr/20231117_0000.csv.gz"),
      Seq((day0 + 2 * 86400 + 3600, 70.0), (day0 + 2 * 86400 + 7200, 71.0)))
    runOnce(root, out, ckpt)
    val s2 = StreamingOverview.finalStats(spark, out, keys)
    assert(rowsOf(s2) === rowsOf(batchStats(root)))
    assert(rowsOf(s2.filter(col("participant_id") === "p3")
      .select("row_count")) === Seq(Seq(2L)))
  }
}
