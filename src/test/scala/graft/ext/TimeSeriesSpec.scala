package graft.ext

import java.sql.Date

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Resample/fill/smooth operators against hand-computed expectations. */
class TimeSeriesSpec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)

  // user 1: days 1,4 observed (gap 2,3); user 2: single day
  private lazy val daily = df(Seq(
    (1L, d("2024-01-01"), Option(10.0)),
    (1L, d("2024-01-04"), Option(40.0)),
    (2L, d("2024-02-01"), Option(7.0))),
    "uid", "day", "v")

  test("dayGrid completes each key's span; values null in gaps") {
    val g = TimeSeries.dayGrid(daily, Seq("uid"), "day")
    val rows = rowsOf(g.orderBy("uid", "day"))
    assert(rows == Seq(
      Seq(1L, d("2024-01-01"), 10.0), Seq(1L, d("2024-01-02"), null),
      Seq(1L, d("2024-01-03"), null), Seq(1L, d("2024-01-04"), 40.0),
      Seq(2L, d("2024-02-01"), 7.0)))
  }

  test("fillForward carries the last observation across the gap") {
    val f = TimeSeries.fillForward(
      TimeSeries.dayGrid(daily, Seq("uid"), "day"),
      Seq("uid"), "day", "v", "filled")
    assert(rowsOf(f.select("uid", "day", "filled").orderBy("uid", "day")) == Seq(
      Seq(1L, d("2024-01-01"), 10.0), Seq(1L, d("2024-01-02"), 10.0),
      Seq(1L, d("2024-01-03"), 10.0), Seq(1L, d("2024-01-04"), 40.0),
      Seq(2L, d("2024-02-01"), 7.0)))
  }

  test("interpolateLinear splits the gap proportionally") {
    val i = TimeSeries.interpolateLinear(
      TimeSeries.dayGrid(daily, Seq("uid"), "day"),
      Seq("uid"), "day", "v", "interp")
    // 10 → 40 over 3 days: 20 at day 2, 30 at day 3
    assert(rowsOf(i.select("uid", "day", "interp").orderBy("uid", "day")) == Seq(
      Seq(1L, d("2024-01-01"), 10.0), Seq(1L, d("2024-01-02"), 20.0),
      Seq(1L, d("2024-01-03"), 30.0), Seq(1L, d("2024-01-04"), 40.0),
      Seq(2L, d("2024-02-01"), 7.0)))
  }

  test("ewma matches the closed form by hand (alpha = 0.5)") {
    val series = df(Seq(
      (1L, d("2024-01-01"), 2.0), (1L, d("2024-01-02"), 4.0),
      (1L, d("2024-01-03"), 8.0)), "uid", "day", "v")
    val e = TimeSeries.ewma(series, Seq("uid"), "day", "v", 0.5, "e")
    // adjust=true: t1: 2; t2: (0.5*2+4)/1.5 = 10/3; t3: (0.25*2+0.5*4+8)/1.75 = 6
    assert(rowsOf(e.select("uid", "day", "e").orderBy("day")) == Seq(
      Seq(1L, d("2024-01-01"), 2.0), Seq(1L, d("2024-01-02"), 3.3333),
      Seq(1L, d("2024-01-03"), 6.0)))
  }
}
