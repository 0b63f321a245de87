package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HLL sketch partials must (a) round-trip exactly for small groups
  * (sparse mode), (b) merge across increments to the same estimate as a
  * single pass, and (c) stay within the advertised error envelope at
  * cardinalities past the sparse/dense transition. */
class ApproxDistinctSpec extends SparkSpec {

  test("small groups: estimate == exact; split-merge == single pass") {
    val rows = for (g <- 0 until 4; i <- 0 until 50) yield (s"g$g", s"u${i % (10 + g)}")
    val d = df(rows, "k", "u")
    val exact = d.groupBy("k").agg(count_distinct(col("u")).as("n"))

    val single = ApproxDistinct.mergeEstimate(
      ApproxDistinct.sketchPartials(d, Seq("k"), col("u")), Seq("k"))
    assert(rowsOf(single.orderBy("k")) === rowsOf(
      exact.withColumnRenamed("n", "distinct_est").orderBy("k")))

    // two increments (overlapping values), unioned — same answer
    val (inc1, inc2) = (d.filter(col("u") =!= "u3"), d.filter(col("u") =!= "u5"))
    val merged = ApproxDistinct.mergeEstimate(
      ApproxDistinct.sketchPartials(inc1, Seq("k"), col("u"))
        .unionAll(ApproxDistinct.sketchPartials(inc2, Seq("k"), col("u"))),
      Seq("k"))
    assert(rowsOf(merged.orderBy("k")) === rowsOf(single.orderBy("k")))
  }

  test("large cardinality stays within ~5 sigma of exact") {
    val n = 100000
    val d = df((1 to n).map(i => Tuple1(s"v$i")), "u")
    val est = ApproxDistinct.mergeEstimate(
      ApproxDistinct.sketchPartials(d.withColumn("k", lit("all")), Seq("k"), col("u")),
      Seq("k")).head().getLong(1)
    // lgConfigK=12 -> rse ~1.04/sqrt(4096) ~ 1.6%; allow 5x
    assert(math.abs(est - n) < n * 0.08, s"estimate $est vs exact $n")
  }
}
