package graft.ext

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._

import graft.SparkSpec

/** Resample/fill/smooth operators against hand-computed expectations. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

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

  test("robustZ: Iglewicz-Hoaglin score by hand; zero MAD nulls out") {
    val series = df(Seq(
      (1L, 1.0), (1L, 2.0), (1L, 3.0), (1L, 4.0), (1L, 100.0),
      (2L, 5.0), (2L, 5.0), (2L, 5.0)), "uid", "v")
    val z = TimeSeries.robustZ(series, Seq("uid"), "v", "z")
      .select("uid", "v", "z")
    // uid 1: median 3, adevs (2,1,0,1,97) → MAD 1;
    // z(100) = 0.6745 * 97 = 65.4265
    val byV = z.filter($"uid" === 1).as[(Long, Double, Double)]
      .collect().map(r => r._2 -> r._3).toMap
    assert(byV(100.0) == 65.4265)
    assert(byV(3.0) == 0.0)
    assert(byV(1.0) == -1.349)
    // constant series: MAD 0 → null scores, not Inf
    assert(z.filter($"uid" === 2 && $"z".isNotNull).count() == 0)
  }

  test("cusum closed form equals the textbook recursion") {
    val zs = Seq(0.5, 2.0, -1.0, 3.0, 0.2, -4.0, 1.0, 1.0)
    val series = zs.zipWithIndex.map { case (v, i) => (1L, i, v) }
    val got = TimeSeries.cusum(df(series, "uid", "t", "z"),
        Seq("uid"), "t", "z", k = 0.5, "s")
      .orderBy("t").select("s").as[Double].collect().toSeq
    val want = zs.scanLeft(0.0) { (s, z) => math.max(0.0, s + z - 0.5) }.tail
    got.zip(want).foreach { case (g, w) => assert(g === w +- 1e-12) }
  }

  test("holt closed form equals the direct recursion") {
    val ys = Seq(10.0, 12.0, 11.0, 15.0, 18.0, 17.0, 22.0)
    val (alpha, beta) = (0.4, 0.3)
    // direct recursion: s1 = y1, b1 = 0
    var (sv, bv) = (ys.head, 0.0)
    val want = ys.head +: ys.tail.map { y =>
      val sNew = alpha * y + (1 - alpha) * (sv + bv)
      bv = beta * (sNew - sv) + (1 - beta) * bv
      sv = sNew
      sv
    }
    val series = ys.zipWithIndex.map { case (v, i) => (1L, i, v) }
    val got = TimeSeries.holt(df(series, "uid", "t", "y"),
        Seq("uid"), "t", "y", alpha, beta, horizon = 3, maxLen = 16,
        scale = 8)
      .orderBy("t").select("level").as[Double].collect().toSeq
    got.zip(want).foreach { case (g, w) => assert(g === w +- 1e-6) }
  }

  test("holt forecast extrapolates a perfect linear trend") {
    // y_t = 5t: once level/trend lock on, forecast(h=2) ≈ y_t + 10
    val ys = (1 to 20).map(_ * 5.0)
    val series = ys.zipWithIndex.map { case (v, i) => (1L, i, v) }
    val last = TimeSeries.holt(df(series, "uid", "t", "y"),
        Seq("uid"), "t", "y", alpha = 0.5, beta = 0.5, horizon = 2,
        maxLen = 32)
      .orderBy(desc("t")).select("forecast").as[Double].head()
    assert(math.abs(last - (100.0 + 10.0)) < 1.0, s"forecast $last")
  }

  test("holt fails loudly past maxLen") {
    val series = (1 to 6).map(i => (1L, i, i.toDouble))
    val ex = intercept[Exception] {
      TimeSeries.holt(df(series, "uid", "t", "y"), Seq("uid"), "t", "y",
        alpha = 0.4, beta = 0.3, horizon = 1, maxLen = 4).collect()
    }
    assert(ex.getMessage.contains("maxLen") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxLen")))
  }
}
