package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The injected optimizer rule must turn a BETWEEN theta-join into an
  * equi-join plan (no BNLJ/cartesian) with IDENTICAL results, fire only
  * when the conf opts in, and leave other joins alone. */
class RangeJoinRewriteSpec extends SparkSpec {

  private val confKey = "spark.graft.rangeJoin.bandWidth"

  private def points = df(
    (-25L to 95L by 5L).map(t => (t, s"p$t")), "ts", "tag")
  private def intervals = df(Seq(
    (-30L, -10L, "neg"), (-5L, 14L, "cross_zero"), (10L, 10L, "degenerate"),
    (20L, 19L, "inverted"), (0L, 89L, "wide"), (35L, 44L, "inner")),
    "lo", "hi", "name")

  private def thetaJoin: DataFrame =
    points.join(intervals, col("ts") >= col("lo") && col("ts") <= col("hi"))

  private def withRule[A](width: Long)(f: => A): A = {
    graft.GraftExtensions.register(spark)
    spark.conf.set(confKey, width.toString)
    try f finally spark.conf.unset(confKey)
  }

  test("rewrites BETWEEN theta-join to an equi-join plan with identical results") {
    val expected = rowsOf(thetaJoin.orderBy("ts", "name"))
    withRule(10L) {
      val plan = thetaJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(rowsOf(thetaJoin.orderBy("ts", "name")) === expected)
    }
    // mirrored operand order (interval side on the left) also rewrites
    val mirrored = intervals.join(points,
      col("ts") >= col("lo") && col("ts") <= col("hi"))
    val mExpected = rowsOf(mirrored.orderBy("ts", "name"))
    withRule(7L) {
      val plan = mirrored.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(rowsOf(mirrored.orderBy("ts", "name")) === mExpected)
    }
  }

  test("does not fire without the conf, on equi-joins, or on half conditions") {
    graft.GraftExtensions.register(spark)
    // conf unset: plan keeps the nested-loop shape
    assert(thetaJoin.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    withRule(10L) {
      // an equi-join must pass through untouched
      val equi = points.join(intervals, col("ts") === col("lo"))
      assert(equi.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      // a single bound is not containment — untouched (still BNLJ)
      val half = points.join(intervals, col("ts") >= col("lo"))
      assert(half.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    }
  }

  test("one pathologically wide interval fails loudly, not with an array OOM") {
    // hi = MAX_VALUE sentinel: (hi-lo)/w bands would silently multiply
    // the interval side; the injected guard must raise a message that
    // names the rule instead
    val corrupt = df(Seq((0L, Long.MaxValue, "sentinel")), "lo", "hi", "name")
    val theta = points.join(corrupt,
      col("ts") >= col("lo") && col("ts") <= col("hi"))
    withRule(10L) {
      val e = intercept[Exception] { theta.collect() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("RangeJoinRewrite")),
        s"wrong failure: ${messages(e).mkString(" | ")}")
    }
  }

  test("computed band operands and null bounds behave like the theta join") {
    // point expression is computed (ts + 1); hi is nullable with a null row
    val iv = df(Seq(
      (Some(0L), Some(20L), "ok"),
      (Some(5L), None, "null_hi"),
      (None, Some(9L), "null_lo")),
      "lo", "hi", "name")
      .select(col("lo").cast("long").as("lo"),
        col("hi").cast("long").as("hi"), col("name"))
    val theta = points.select((col("ts") + 1).as("ts1"))
      .join(iv, col("ts1") >= col("lo") && col("ts1") <= col("hi"))
    val expected = rowsOf(theta.orderBy("ts1", "name"))
    withRule(10L) {
      assert(!theta.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(rowsOf(theta.orderBy("ts1", "name")) === expected)
    }
  }
}
