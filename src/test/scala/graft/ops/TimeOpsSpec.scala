package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** P2-P4 semantics (SURVEY.md §2.2): epoch coercion, time-bucket keys.
  * ISO-week expectations are pinned to Python `date.isocalendar()`, the
  * reference's implementation (`extract_patient_summary.py:97-99`). */
class TimeOpsSpec extends SparkSpec {

  test("epochSecondsToTs: fractional seconds parse, junk coerces to null") {
    val d = df(Seq(
      ("a", "1729146600.70951"),
      ("b", "not-a-number"),
      ("c", null.asInstanceOf[String])), "id", "raw")
      .select(col("id"), TimeOps.epochSecondsToTs(col("raw")).as("ts"))
    val m = d.collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(m("a").get.toString.startsWith("2024-10-17 06:30:00"))
    assert(m("b").isEmpty && m("c").isEmpty)
  }

  test("isoWeekKey matches Python isocalendar() on year-boundary dates") {
    // (date, expected) pinned from CPython: isocalendar() week-based year.
    val cases = Seq(
      ("2021-01-01", "2020-W53"), // Friday of 2020's week 53
      ("2016-01-04", "2016-W01"), // first ISO Monday of 2016
      ("2014-12-29", "2015-W01"), // Monday belonging to next ISO year
      ("2017-01-01", "2016-W52"), // Sunday of 2016's last week
      ("2020-12-31", "2020-W53"),
      ("2024-06-15", "2024-W24"))
    val d = df(cases, "day", "expected")
      .withColumn("got", TimeOps.isoWeekKey(to_timestamp(col("day"))))
    val bad = d.filter(col("got") =!= col("expected")).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.mkString(", ")}")
  }

  test("month/year/day keys format as the reference's strftime patterns") {
    val d = df(Seq(Tuple1("2024-03-07 08:09:10")), "raw")
      .select(
        TimeOps.monthKey(to_timestamp(col("raw"))).as("m"),
        TimeOps.yearKey(to_timestamp(col("raw"))).as("y"),
        TimeOps.dayKey(to_timestamp(col("raw"))).as("d"))
    assert(rowsOf(d) == Seq(Seq("2024-03", "2024", "2024-03-07")))
  }

  test("timeKey rejects unknown resolutions like the reference's ValueError") {
    intercept[IllegalArgumentException](TimeOps.timeKey(col("ts"), "decade"))
  }

  test("firstTimeColumn picks by priority order, not schema order") {
    val cols = Seq("value.startTime", "timestamp", "other")
    val pri = Seq("time", "timestamp", "value.startTime")
    assert(TimeOps.firstTimeColumn(cols, pri).contains("timestamp"))
    assert(TimeOps.firstTimeColumn(Seq("zzz"), pri).isEmpty)
  }
}
