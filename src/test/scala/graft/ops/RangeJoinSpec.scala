package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The banded rewrite must equal the all-pairs theta-join exactly:
  * every containing (point, interval) pair once, boundaries inclusive,
  * across band edges and negative domains. */
class RangeJoinSpec extends SparkSpec {

  private def points = df(
    (-25L to 95L by 10L).map(t => (t, s"p$t")), "ts", "tag")
  private def intervals = df(Seq(
    (-30L, -10L, "neg"),       // fully negative: floor-div must not skew
    (-5L, 14L, "cross_zero"),  // spans the 0 band edge
    (10L, 10L, "degenerate"),  // single-instant interval
    (20L, 19L, "inverted"),    // hi < lo: matches nothing
    (0L, 89L, "wide"),         // spans many bands
    (35L, 44L, "inner")), "lo", "hi", "name")

  private def naive =
    points.crossJoin(intervals)
      .filter(col("ts") >= col("lo") && col("ts") <= col("hi"))

  test("banded join == cross-join theta twin for any bandWidth") {
    for (w <- Seq(1L, 7L, 10L, 1000L)) {
      val banded = RangeJoin.bandedIntervalJoin(
        points, intervals, "ts", "lo", "hi", bandWidth = w)
      assert(rowsOf(banded.orderBy("ts", "name")) ===
        rowsOf(naive.orderBy("ts", "name")), s"bandWidth=$w")
    }
  }

  test("boundaries are inclusive and pairs match exactly once") {
    val out = RangeJoin.bandedIntervalJoin(
      df(Seq((10L, "x"), (44L, "y")), "ts", "tag"), intervals,
      "ts", "lo", "hi", bandWidth = 10L)
    val names = rowsOf(out.orderBy("ts", "name"))
      .map(r => (r(0), r(4))) // (ts, tag, lo, hi, name)
    // ts=10: degenerate [10,10], cross_zero [-5,14], wide [0,89];
    // ts=44: inner hi boundary [35,44], wide — each exactly once
    assert(names === Seq(
      (10L, "cross_zero"), (10L, "degenerate"), (10L, "wide"),
      (44L, "inner"), (44L, "wide")))
  }

  private def rights = df(Seq(
    (-40L, -28L, "r_neg"),      // overlaps only `neg`
    (-12L, 2L, "r_bridge"),     // overlaps neg, cross_zero, wide
    (10L, 10L, "r_point"),      // instant: cross_zero, degenerate, wide
    (90L, 95L, "r_past"),       // past wide's hi=89: nothing
    (44L, 50L, "r_edge")), "rlo", "rhi", "rname") // inner hi boundary + wide

  private def naiveOverlap =
    intervals.crossJoin(rights)
      .filter(col("lo") <= col("rhi") && col("rlo") <= col("hi"))

  test("overlap join == cross-join theta twin for any bandWidth") {
    for (w <- Seq(1L, 7L, 10L, 1000L)) {
      val banded = RangeJoin.bandedOverlapJoin(
        intervals, rights, "lo", "hi", "rlo", "rhi", bandWidth = w)
      assert(rowsOf(banded.orderBy("name", "rname")) ===
        rowsOf(naiveOverlap.orderBy("name", "rname")), s"bandWidth=$w")
    }
  }

  test("overlap pairs sharing many buckets still emit exactly once") {
    // wide [0,89] and r [5,85] share 9 buckets at bandWidth=10
    val out = RangeJoin.bandedOverlapJoin(
      intervals, df(Seq((5L, 85L, "r_wide")), "rlo", "rhi", "rname"),
      "lo", "hi", "rlo", "rhi", bandWidth = 10L)
    val names = rowsOf(out).map(r => (r(2).toString, r(5).toString)).sorted
    assert(names === Seq(("cross_zero", "r_wide"), ("degenerate", "r_wide"),
      ("inner", "r_wide"), ("wide", "r_wide")))
  }

  test("an interval over the fan-out cap fails with a row-identifying error") {
    val corrupt = df(Seq((0L, Long.MaxValue, "sentinel")), "lo", "hi", "name")
    val e = intercept[Exception] {
      RangeJoin.bandedIntervalJoin(points, corrupt, "ts", "lo", "hi",
        bandWidth = 10L, maxBandsPerInterval = 100L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("split the interval")), e.toString)
  }
}
