package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bloom prune must (a) never drop a true match (no false
  * negatives), (b) leave the final result identical to the plain
  * semi-join even when the filter is sized to admit false positives,
  * and (c) actually place a might_contain filter on the fact side of
  * the executed plan. */
class BloomPruneSpec extends SparkSpec {

  private def fact = df((1 to 400).map(i => (i.toLong % 100, s"f$i")), "fk", "v")
  private def dim = df((0 to 19).map(i => (i.toLong * 5, s"d$i")), "dk", "w")

  test("pruned semi-join == plain semi-join, even with a tiny lossy filter") {
    // expectedItems=2 for 20 keys: heavily undersized, so might_contain
    // passes many non-matches — exactness must come from the semi-join
    val pruned = BloomPrune.prunedSemiJoin(fact, dim, "fk", "dk",
      expectedItems = 2, fpp = 0.5)
    val plain = fact.join(dim, col("fk") === col("dk"), "left_semi")
    assert(rowsOf(pruned.orderBy("fk", "v")) === rowsOf(plain.orderBy("fk", "v")))
    assert(rowsOf(pruned).nonEmpty)
  }

  test("bloom has no false negatives: every dim key passes might_contain") {
    val bf = BloomPrune.buildBloom(dim, "dk", expectedItems = 64, fpp = 0.01).get
    val misses = dim.filter(!BloomPrune.mightContain(bf, col("dk"))).count()
    assert(misses === 0L)
  }

  test("the executed plan carries a bloom_filter probe on the fact scan") {
    // a LocalRelation fact would let ConvertToLocalRelation evaluate the
    // probe at optimize time (correct but invisible); Range keeps the
    // Filter node in the physical plan so the shape can be asserted
    val rangeFact = spark.range(400).select(
      (col("id") % 100).as("fk"), col("id").as("v"))
    val pruned = BloomPrune.prunedSemiJoin(rangeFact, dim, "fk", "dk",
      expectedItems = 64, fpp = 0.01)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("same key name on both sides resolves (no AMBIGUOUS_REFERENCE)") {
    val f = fact.withColumnRenamed("fk", "id")
    val d = dim.withColumnRenamed("dk", "id")
    val pruned = BloomPrune.prunedSemiJoin(f, d, "id", "id")
    val plain = f.join(d.select(col("id").as("__k")),
      col("id") === col("__k"), "left_semi")
    assert(rowsOf(pruned.orderBy("id", "v")) === rowsOf(plain.orderBy("id", "v")))
  }

  test("empty dim yields an empty result, not a crash") {
    val empty = dim.filter(lit(false))
    assert(rowsOf(BloomPrune.prunedSemiJoin(fact, empty, "fk", "dk")).isEmpty)
  }
}
