package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

final case class FreqRow(v: String)

class FreqSketchSpec extends SparkSpec {

  private def words(xs: (String, Int)*): Seq[FreqRow] =
    xs.flatMap { case (w, n) => Seq.fill(n)(FreqRow(w)) }

  test("estimate never underestimates and is exact without full collisions") {
    val data = df(words("a" -> 50, "b" -> 30, "c" -> 7, "d" -> 1))
    val sketch = FreqSketch.sketchPartials(data, "v", width = 1024, depth = 3)
    val est = FreqSketch.estimate(sketch, data.select("v").distinct(), "v", 1024, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("a" -> 50L, "b" -> 30L, "c" -> 7L, "d" -> 1L)
    exact.foreach { case (w, n) => assert(est(w) >= n, s"underestimated $w") }
    // width 1024 over 4 values: full 3-row collisions are impossible here
    assert(est == exact)
  }

  test("split partials merge to the single-pass sketch") {
    val data = df(words("x" -> 40, "y" -> 9, "z" -> 3))
    val whole = FreqSketch.sketchPartials(data, "v", 256, 2)
    val day1 = FreqSketch.sketchPartials(data.limit(20), "v", 256, 2)
    val day2 = FreqSketch.sketchPartials(
      data.exceptAll(data.limit(20)), "v", 256, 2)
    val merged = FreqSketch.merge(day1.unionByName(day2))
    assert(rowsOf(merged.orderBy("depth", "bucket")).map(_.map(_.toString)) ==
      rowsOf(whole.orderBy("depth", "bucket")).map(_.map(_.toString)))
  }

  test("collisions only ever add mass (overestimate-only contract)") {
    // width 2 forces heavy collisions; estimates must still dominate truth
    val data = df(words("a" -> 5, "b" -> 4, "c" -> 3, "d" -> 2, "e" -> 1))
    val hh = FreqSketch.heavyHitters(data, "v", width = 2, depth = 2, minCount = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("a" -> 5L, "b" -> 4L, "c" -> 3L, "d" -> 2L, "e" -> 1L)
    hh.foreach { case (w, est) => assert(est >= exact(w)) }
    // true heavy hitters can never be missed, whatever the collisions
    assert(Set("a", "b", "c").subsetOf(hh.keySet))
  }

  test("null values are skipped, not bucketed") {
    val data = df(Seq(Some("a"), None, Some("a"), None).map(o => Tuple1(o.orNull)), "v")
    val sketch = FreqSketch.sketchPartials(data, "v", 64, 2)
    val total = sketch.agg(sum("cnt")).collect()(0).getLong(0)
    assert(total == 4L) // 2 non-null rows × depth 2
  }

  test("heavy hitters filters below threshold") {
    val data = df(words("big" -> 100, "mid" -> 10, "small" -> 1))
    val hh = FreqSketch.heavyHitters(data, "v", 1024, 3, minCount = 50)
      .collect().map(_.getString(0)).toSet
    assert(hh == Set("big"))
  }

  test("heavy-hitter dedup only shuffles rows that pass the estimate filter") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val data = df(words("big" -> 100, "mid" -> 10, "small" -> 1))
    val hh = FreqSketch.heavyHitters(data, "v", 1024, 3, minCount = 50)
    val plan = hh.queryExecution.optimizedPlan
    // the candidate pass is the distinct() over (value, est) — it must
    // sit ABOVE the est >= minCount filter, so tail values never reach
    // its shuffle (the old shape shuffled one row per distinct value)
    val dedup = plan.collectFirst {
      case a: Aggregate if a.groupingExpressions.size == 2 => a
    }.getOrElse(fail("no dedup aggregate in plan"))
    val filtered = dedup.collectFirst {
      case f: Filter if f.condition.references.exists(_.name == "est") ||
        f.condition.sql.contains(">= 50") => f
    }
    assert(filtered.nonEmpty,
      s"estimate filter not below the dedup aggregate:\n$dedup")
  }

  test("depth=1 sketches are legal (single-row min is the estimate)") {
    val data = df(words("big" -> 40, "small" -> 2))
    val hh = FreqSketch.heavyHitters(data, "v", 1024, depth = 1, minCount = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("big" -> 40L))
  }

  test("estimate ignores NULL probes instead of bucketing the bare seed") {
    val data = df(words("a" -> 5, "b" -> 2))
    val sketch = FreqSketch.sketchPartials(data, "v", 64, 2)
    val probes = df(Seq(Some("a"), None).map(o => Tuple1(o.orNull)), "v")
    val est = FreqSketch.estimate(sketch, probes, "v", 64, 2).collect()
    assert(est.map(_.getString(0)).toSeq == Seq("a"))
    assert(est.head.getLong(1) == 5L)
  }
}
