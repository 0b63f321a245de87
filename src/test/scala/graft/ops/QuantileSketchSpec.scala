package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The quantile sketch must (a) merge losslessly — any split of the
  * input sketched separately and merged equals the one-pass sketch —
  * and (b) estimate within its stated error bound of one bin width. */
class QuantileSketchSpec extends SparkSpec {

  private val (lo, hi, bins) = (0.0, 100.0, 50) // bin width 2.0
  private def data = df(
    (1 to 400).map(i => (s"g${i % 2}", (i % 100) + 0.5)), "k", "v")

  test("split + merge == one-pass sketch (additive partials)") {
    val onePass = QuantileSketch.sketchPartials(data, Seq("k"), "v", lo, hi, bins)
    val split = QuantileSketch.merge(
      QuantileSketch.sketchPartials(
          data.filter(col("v") < 37), Seq("k"), "v", lo, hi, bins)
        .unionByName(QuantileSketch.sketchPartials(
          data.filter(col("v") >= 37), Seq("k"), "v", lo, hi, bins)),
      Seq("k"))
    assert(rowsOf(split.orderBy("k", "bin")) ===
      rowsOf(onePass.orderBy("k", "bin")))
  }

  test("estimates are within one bin width of the exact quantile") {
    val partials = QuantileSketch.sketchPartials(data, Seq("k"), "v", lo, hi, bins)
    val est = rowsOf(QuantileSketch.estimate(partials, Seq("k"), lo, hi, bins,
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)).orderBy("k"))
    val exact = rowsOf(data.groupBy("k").agg(
      expr("percentile(v, 0.5)"), expr("percentile(v, 0.9)"),
      expr("percentile(v, 0.99)")).orderBy("k"))
    est.zip(exact).foreach { case (e, x) =>
      (1 to 3).foreach { i =>
        val (a, b) = (e(i).asInstanceOf[Double], x(i).asInstanceOf[Double])
        assert(math.abs(a - b) <= 2.0, s"${e.head} q$i: est $a vs exact $b")
        assert(a >= lo && a <= hi)
      }
      // monotone across quantiles
      assert(e(1).asInstanceOf[Double] <= e(2).asInstanceOf[Double])
      assert(e(2).asInstanceOf[Double] <= e(3).asInstanceOf[Double])
    }
  }

  test("out-of-range values clamp into edge bins, mass conserved; NaN excluded") {
    val wild = df(Seq(("a", -50.0), ("a", 1e6), ("a", 10.0), ("a", Double.NaN)),
      "k", "v")
    val p = QuantileSketch.sketchPartials(wild, Seq("k"), "v", lo, hi, bins)
    assert(rowsOf(p.orderBy("bin")) === Seq(
      Seq("a", 0L, 1L), Seq("a", 5L, 1L), Seq("a", 49L, 1L)))
  }

  test("estimate on a raw unmerged union == estimate on merged partials") {
    val half1 = QuantileSketch.sketchPartials(
      data.filter(col("v") < 37), Seq("k"), "v", lo, hi, bins)
    val half2 = QuantileSketch.sketchPartials(
      data.filter(col("v") >= 37), Seq("k"), "v", lo, hi, bins)
    val union = half1.unionByName(half2) // duplicate (k, bin) rows
    val viaUnion = QuantileSketch.estimate(union, Seq("k"), lo, hi, bins,
      Seq("p50" -> 0.5, "p90" -> 0.9))
    val viaMerged = QuantileSketch.estimate(
      QuantileSketch.merge(union, Seq("k")), Seq("k"), lo, hi, bins,
      Seq("p50" -> 0.5, "p90" -> 0.9))
    assert(rowsOf(viaUnion.orderBy("k")) === rowsOf(viaMerged.orderBy("k")))
  }

  test("key names colliding with sketch columns are rejected up front") {
    intercept[IllegalArgumentException] {
      QuantileSketch.sketchPartials(
        data.withColumnRenamed("k", "bin"), Seq("bin"), "v", lo, hi, bins)
    }
  }
}
