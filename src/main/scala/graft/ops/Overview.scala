package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The `process-overview.py` semantics (SURVEY.md §2.6 A1-A3, A13, O1, U3):
  * per-(site, participant, metric) row_count, start/end date, distinct-day
  * count; optional per-device sub-split; per-site plus combined outputs.
  *
  * The reference accumulates per-file partial stats and merges them in
  * Python (`process-overview.py:80-194`). In Spark the partial→final merge
  * is exactly what HashAggregateExec already does (map-side partial
  * aggregation, then a single shuffle on the group keys), so the whole
  * pipeline is one `groupBy.agg` — at 100 TB the only wide dependency is
  * that one shuffle, and `countDistinct(day)` is the only expensive
  * aggregate (switchable to `approx_count_distinct` via `exactDays`).
  */
object Overview {

  /** A1+A2+A3+O1: grouped stats over an event-time column.
    *
    * Output columns: groupCols ++ (row_count, start_date, end_date,
    * day_count), sorted by the group keys (`process-overview.py:226`).
    * Dates are `yyyy-MM-dd` strings per `isoformat()` at
    * `process-overview.py:118-121`.
    */
  def stats(
      df: DataFrame,
      groupCols: Seq[String],
      tsCol: Column,
      exactDays: Boolean = true): DataFrame = {
    val day = to_date(tsCol)
    val dayCount =
      if (exactDays) count_distinct(day) else approx_count_distinct(day)
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("row_count"),
        date_format(min(tsCol), "yyyy-MM-dd").as("start_date"),
        date_format(max(tsCol), "yyyy-MM-dd").as("end_date"),
        dayCount.as("day_count"))
      .orderBy(groupCols.map(col): _*)
  }

  /** A13: device sub-split — when a column whose name contains "device"
    * exists, a metric's stats are additionally broken out per device with
    * the metric renamed `metric/device` (`process-overview.py:129-150`).
    * Device-column detection is schema introspection, not data inspection.
    *
    * Note: the reference reuses the file-level date range for every device
    * group (`process-overview.py:140-149`); we compute true per-device
    * ranges (documented fix, SURVEY.md §2.11.5).
    */
  def deviceColumn(df: DataFrame): Option[String] =
    df.columns.find(_.toLowerCase.contains("device"))

  def deviceSplit(
      df: DataFrame,
      groupCols: Seq[String],
      metricCol: String,
      tsCol: Column): DataFrame = {
    val dev = deviceColumn(df).map(col).getOrElse(lit("unknown"))
    val withMetric = df.withColumn(
      "metric_device", concat_ws("/", col(metricCol), dev))
    stats(withMetric, groupCols :+ "metric_device", tsCol)
  }

  /** U3: per-site and combined ("all_sites") dual materialization
    * (`process-overview.py:196-249`). One pass: cache the stats, write
    * partitioned-by-site (one dir per site) and once combined. */
  def writePerSiteAndCombined(statsDf: DataFrame, outDir: String): Unit = {
    val cached = statsDf.cache()
    try {
      cached.write.mode("overwrite").partitionBy("site")
        .parquet(s"$outDir/per_site")
      cached.write.mode("overwrite").parquet(s"$outDir/all_sites")
    } finally cached.unpersist()
  }
}
