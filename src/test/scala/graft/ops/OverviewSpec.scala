package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A1-A3, A13, O1 (process-overview.py semantics, SURVEY.md §2.6). */
class OverviewSpec extends SparkSpec {

  private def events = df(Seq(
    ("s1", "p1", "hr", "2024-01-01 10:00:00"),
    ("s1", "p1", "hr", "2024-01-01 11:00:00"),
    ("s1", "p1", "hr", "2024-01-03 10:00:00"),
    ("s1", "p2", "hr", "2024-02-01 10:00:00")),
    "site", "participant_id", "metric", "raw")
    .withColumn("ts", to_timestamp(col("raw")))

  test("stats: row_count, start/end date, distinct-day count, sorted") {
    val d = Overview.stats(events, Seq("site", "participant_id", "metric"), col("ts"))
    assert(rowsOf(d) == Seq(
      Seq("s1", "p1", "hr", 3L, "2024-01-01", "2024-01-03", 2L),
      Seq("s1", "p2", "hr", 1L, "2024-02-01", "2024-02-01", 1L)))
  }

  test("stats: approx day-count switch stays exact on tiny cardinalities") {
    val d = Overview.stats(events, Seq("site"), col("ts"), exactDays = false)
    assert(rowsOf(d.select("day_count")) == Seq(Seq(3L)))
  }

  test("deviceSplit: detects device column by name and splits metric/device") {
    val withDev = events.withColumn("deviceId",
      when(col("participant_id") === "p1", "fitbit").otherwise("apple"))
    assert(Overview.deviceColumn(withDev).contains("deviceId"))
    val d = Overview.deviceSplit(withDev, Seq("site"), "metric", col("ts"))
    assert(rowsOf(d.select("metric_device", "row_count")) == Seq(
      Seq("hr/apple", 1L), Seq("hr/fitbit", 3L)))
  }

  test("deviceSplit: no device column falls back to 'unknown'") {
    val d = Overview.deviceSplit(events, Seq("site"), "metric", col("ts"))
    assert(rowsOf(d.select("metric_device")) == Seq(Seq("hr/unknown")))
  }

  test("writePerSiteAndCombined: per-site dirs + combined output hold the same rows (U3)") {
    val out = java.nio.file.Files.createTempDirectory("graft-overview").toString
    val stats = Overview.stats(events, Seq("site", "participant_id", "metric"), col("ts"))
    Overview.writePerSiteAndCombined(stats, out)
    val combined = spark.read.parquet(s"$out/all_sites")
    val perSite = spark.read.parquet(s"$out/per_site") // partition col restored
    assert(combined.count() == 2 && perSite.count() == 2)
    assert(new java.io.File(s"$out/per_site/site=s1").isDirectory)
    assert(perSite.columns.sorted.toSeq == combined.columns.sorted.toSeq)
    assert(rowsOf(perSite.select("site", "row_count").orderBy("participant_id")) ==
      rowsOf(combined.select("site", "row_count").orderBy("participant_id")))
  }
}
