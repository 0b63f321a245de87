package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Single-pass constraint suite: metrics, verdicts, and the null /
  * duplicate / out-of-range failure modes. */
class QualityChecksSpec extends SparkSpec {

  private lazy val d = df(Seq(
    (1L, Option("aaaa"), 10L),
    (2L, Option("bb"), 50L),
    (2L, None, 500L), // duplicate id + null text + out-of-range below
    (4L, Option("dddd"), -1L)),
    "id", "text", "n")

  test("metrics and verdicts: one row per check, failures flagged") {
    val r = QualityChecks.report(d, Seq(
      QualityChecks.notNull("text"),             // 3/4 -> fail at 1.0
      QualityChecks.notNull("id"),               // 4/4 -> pass
      QualityChecks.unique("id"),                // 3 distinct / 4 -> fail
      QualityChecks.inRange("n", 0, 100),        // 2/4 in range -> fail
      QualityChecks.satisfies("len>=3", length(col("text")) >= 3, 0.5), // 2/4 >= 0.5 pass
      QualityChecks.sizeAtLeast(4)))             // pass
    val rows = rowsOf(r.select("check", "metric", "passed"))
    assert(rows == Seq(
      Seq("not_null(text)", 0.75, false),
      Seq("not_null(id)", 1.0, true),
      Seq("unique(id)", 0.75, false),
      Seq("in_range(n)", 0.5, false),
      Seq("satisfies(len>=3)", 0.5, true),
      Seq("size_at_least", 4.0, true)))
  }

  test("the whole suite is one aggregate job (single scan)") {
    val r = QualityChecks.report(d, Seq(
      QualityChecks.notNull("text"), QualityChecks.inRange("n", 0, 100),
      QualityChecks.sizeAtLeast(1)))
    val scans = r.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Scan"))
    assert(scans <= 1, s"expected a single scan, plan had $scans")
  }
}
