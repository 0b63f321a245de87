package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ThetaSketchSpec extends SparkSpec {

  private def keys(ids: Seq[Int]) = {
    import spark.implicits._
    ids.map(i => s"key_$i").toDF("key")
  }

  test("exhaustive mode is exact: small sets report true cardinalities") {
    val a = keys(1 to 40)
    val b = keys(21 to 70)
    val k = 128
    val out = ThetaSketch.setOps(spark,
      ThetaSketch.kmv(a, col("key"), k),
      ThetaSketch.kmv(b, col("key"), k), k).collect()(0)
    assert(out.getLong(0) === 40L) // est_a
    assert(out.getLong(1) === 50L) // est_b
    assert(out.getLong(2) === 70L) // est_union
    assert(out.getLong(3) === 20L) // est_inter
    assert(out.getLong(4) === math.round(10000.0 * 20 / 70)) // jaccard_bp
  }

  test("duplicates don't inflate the sketch") {
    val a = keys(Seq.fill(50)(1 to 30).flatten)
    val k = 64
    val out = ThetaSketch.setOps(spark,
      ThetaSketch.kmv(a, col("key"), k),
      ThetaSketch.kmv(a, col("key"), k), k).collect()(0)
    assert(out.getLong(0) === 30L)
    assert(out.getLong(4) === 10000L) // identical sets: Jaccard 1
  }

  test("saturated mode: estimates within 20% at 64x the sketch size") {
    val n = 16384
    val k = 256
    val a = keys(1 to n)
    val est = ThetaSketch.setOps(spark,
      ThetaSketch.kmv(a, col("key"), k),
      ThetaSketch.kmv(a, col("key"), k), k).collect()(0).getLong(0)
    assert(math.abs(est - n).toDouble / n < 0.2, s"est $est vs $n")
  }

  test("mergeability: merge of part-sketches equals the whole's sketch") {
    val k = 64
    val whole = ThetaSketch.kmv(keys(1 to 2000), col("key"), k)
    val merged = ThetaSketch.merge(k,
      ThetaSketch.kmv(keys(1 to 700), col("key"), k),
      ThetaSketch.kmv(keys(701 to 1400), col("key"), k),
      ThetaSketch.kmv(keys(1401 to 2000), col("key"), k))
    assert(rowsOf(whole.orderBy("h")) === rowsOf(merged.orderBy("h")))
  }

  test("intersection estimate tracks a known overlap when saturated") {
    val k = 256
    // |A| = |B| = 6000, overlap 3000
    val a = keys(1 to 6000)
    val b = keys(3001 to 9000)
    val out = ThetaSketch.setOps(spark,
      ThetaSketch.kmv(a, col("key"), k),
      ThetaSketch.kmv(b, col("key"), k), k).collect()(0)
    val estInter = out.getLong(3)
    assert(math.abs(estInter - 3000).toDouble / 3000 < 0.35,
      s"est_inter $estInter vs 3000")
    val estUnion = out.getLong(2)
    assert(math.abs(estUnion - 9000).toDouble / 9000 < 0.2,
      s"est_union $estUnion vs 9000")
  }
}
