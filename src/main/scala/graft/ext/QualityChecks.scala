package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints evaluated in ONE pass — the
  * Deequ idea (AWS's public data-quality library for Spark) reduced to
  * its useful core: each constraint contributes aggregate expressions
  * to a single `agg`, and the report is the exploded (constraint,
  * metric, pass) table. One job over the data no matter how many
  * constraints; no per-constraint scans, no driver loops.
  *
  * At 100 TB the single-pass property is the whole point: a 12-check
  * suite is still exactly one scan + one (tiny) aggregate row. The one
  * check that adds a shuffle-heavy term is [[Unique]]
  * (count_distinct); swap in approx_count_distinct when an exact
  * uniqueness count is not worth the shuffle (documented trade, same
  * switch as SURVEY §7.6.5).
  */
object QualityChecks {

  /** One declarative constraint: `name` labels the report row,
    * `metric` is an aggregate expression over the frame, `pass` a
    * predicate over the metric's value. */
  final case class Check(name: String, metric: Column, pass: Column => Column)

  /** Fraction of non-null values in `c` must be >= minRatio. */
  def notNull(c: String, minRatio: Double = 1.0): Check =
    Check(s"not_null($c)",
      count(col(c)).cast("double") / count(lit(1)),
      m => m >= minRatio)

  /** `c` must be unique across the frame (exact count_distinct —
    * the one shuffle-heavy check; see class doc). */
  def unique(c: String): Check =
    Check(s"unique($c)",
      count_distinct(col(c)).cast("double") / count(col(c)),
      m => m === 1.0)

  /** Fraction of non-null values inside [lo, hi] must be >= minRatio. */
  def inRange(c: String, lo: Double, hi: Double, minRatio: Double = 1.0): Check =
    Check(s"in_range($c)",
      (sum(when(col(c).between(lo, hi), 1L).otherwise(0L)) /
        greatest(count(col(c)), lit(1L))).cast("double"),
      m => m >= minRatio)

  /** Fraction of non-null values in `allowed` must be >= minRatio. */
  def inSet(c: String, allowed: Seq[String], minRatio: Double = 1.0): Check =
    Check(s"in_set($c)",
      (sum(when(col(c).isin(allowed: _*), 1L).otherwise(0L)) /
        greatest(count(col(c)), lit(1L))).cast("double"),
      m => m >= minRatio)

  /** Fraction of rows satisfying an arbitrary row predicate. */
  def satisfies(name: String, predicate: Column, minRatio: Double = 1.0): Check =
    Check(s"satisfies($name)",
      (sum(when(predicate, 1L).otherwise(0L)).cast("double") / count(lit(1))),
      m => m >= minRatio)

  /** Row count must be >= min. */
  def sizeAtLeast(min: Long): Check =
    Check("size_at_least",
      count(lit(1)).cast("double"),
      m => m >= min.toDouble)

  /** Evaluate all checks in one aggregate pass. Output: one row per
    * check — (check, metric rounded to 6, passed) — in check order. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      round(c.metric, 6).as(s"__m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("ord"), lit(c.name).as("check"),
        col(s"__m$i").as("metric"), c.pass(col(s"__m$i")).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.ord"), col("r.check"), col("r.metric"), col("r.passed"))
      .orderBy("ord")
  }
}
