package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass stats bundle (SURVEY.md §7.3): count / mean / population
  * std-dev / min / max in a single typed [[Aggregator]] using Welford's
  * online algorithm with Chan's parallel merge — numerically stable and
  * a single partial+final pass, vs five separate agg columns.
  *
  * Median is deliberately ABSENT: exact median (the reference's
  * `np.median`, `extract_patient_summary.py:117`) cannot be computed in
  * one streaming pass; the A4 query path keeps Spark's built-in
  * `median` for oracle parity and this aggregator serves the
  * 100 TB fast path where `percentile_approx` tolerance is acceptable.
  *
  * Null inputs are ignored (pandas/numpy skip-nan semantics); an
  * all-null group finishes with nulls, matching `compute_stats` on an
  * empty list (`extract_patient_summary.py:115-116`).
  *
  * Use typed: `ds.groupByKey(...).agg(StatsAggregator.toColumn)`;
  * untyped: `df.agg(functions.udaf(StatsAggregator).apply(col("v")))`.
  */
final case class StatsBuf(n: Long, mean: Double, m2: Double, min: Double, max: Double)

final case class StatsResult(
    count: Long,
    mean: java.lang.Double, std_dev: java.lang.Double,
    min: java.lang.Double, max: java.lang.Double)

object StatsAggregator extends Aggregator[java.lang.Double, StatsBuf, StatsResult] {
  type Buf = StatsBuf
  type Stats = StatsResult

  override def zero: StatsBuf = StatsBuf(0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)

  override def reduce(b: StatsBuf, x: java.lang.Double): StatsBuf =
    if (x == null) b
    else {
      val v = x.doubleValue()
      val n = b.n + 1
      val d = v - b.mean
      val mean = b.mean + d / n
      StatsBuf(n, mean, b.m2 + d * (v - mean), math.min(b.min, v), math.max(b.max, v))
    }

  override def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      StatsBuf(n,
        a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * a.n * b.n / n,
        math.min(a.min, b.min), math.max(a.max, b.max))
    }

  override def finish(b: StatsBuf): StatsResult =
    if (b.n == 0) StatsResult(0L, null, null, null, null)
    else StatsResult(b.n, b.mean, math.sqrt(b.m2 / b.n), b.min, b.max)

  override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
  override def outputEncoder: Encoder[StatsResult] = Encoders.product[StatsResult]
}
