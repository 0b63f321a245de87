package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time semantics of the reference pipelines (SURVEY.md §2.2 P2-P4).
  *
  * Reference behavior being reproduced (MHM-data-pipelines):
  *  - epoch seconds arrive as fractional doubles, invalid values coerce to
  *    null (`process-overview.py:71-78`, `extract_patient_summary.py:134`)
  *  - time-bucket keys are month `%Y-%m`, ISO week `%G-W%V` (week-based
  *    year!), year `%Y` (`extract_patient_summary.py:93-102`)
  *  - day normalization to `%Y-%m-%d` (`process-overview.py:121`)
  *
  * All of these are plain Catalyst expressions — codegen'd, no UDFs — so
  * they stay inside WholeStageCodegen at any scale.
  */
object TimeOps {

  /** P2: epoch-seconds (possibly fractional, possibly junk strings) →
    * timestamp; non-numeric input → null, matching pandas
    * `to_datetime(errors='coerce')`. `try_cast` keeps this ANSI-safe. */
  def epochSecondsToTs(c: Column): Column =
    timestamp_seconds(c.try_cast("double"))

  /** P4: normalize to a day string `yyyy-MM-dd` (`process-overview.py:121`). */
  def dayKey(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** P3 month resolution (`extract_patient_summary.py:96`). */
  def monthKey(ts: Column): Column = date_format(ts, "yyyy-MM")

  /** P3 year resolution (`extract_patient_summary.py:101`). */
  def yearKey(ts: Column): Column = date_format(ts, "yyyy")

  /** P3 ISO week resolution `<iso-year>-W<iso-week>` — the week-based year
    * of Python's `date.isocalendar()` (`extract_patient_summary.py:97-99`).
    *
    * Spark's `weekofyear` is already ISO-8601, but the week-based YEAR has
    * no built-in pattern (Spark rejects 'YYYY'); use the Thursday rule:
    * the ISO year of a date is the calendar year of the Thursday of its
    * ISO week. `weekday(d)` is 0=Monday..6=Sunday, so that Thursday is
    * `d + (3 - weekday(d))` days away.
    */
  def isoWeekKey(ts: Column): Column = {
    val d = to_date(ts)
    val thursday = date_add(d, lit(3) - weekday(d))
    concat(
      year(thursday).cast("string"),
      lit("-W"),
      lpad(weekofyear(d).cast("string"), 2, "0"))
  }

  /** Time-bucket dispatcher mirroring `get_time_key`
    * (`extract_patient_summary.py:93-102`). */
  def timeKey(ts: Column, resolution: String): Column = resolution match {
    case "month" => monthKey(ts)
    case "week"  => isoWeekKey(ts)
    case "year"  => yearKey(ts)
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported time resolution: $other (reference raises ValueError)")
  }

  /** Ordered-coalesce time column resolution: the first present column of
    * the priority list wins (`data_collection.py:53-59,108`). Missing
    * columns are skipped at plan time (schema introspection, not runtime).
    */
  def firstTimeColumn(columns: Seq[String], priority: Seq[String]): Option[String] =
    priority.find(columns.contains)
}
