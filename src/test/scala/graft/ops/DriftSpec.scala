package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {

  private def sample(rows: Seq[(String, Long, Boolean)]) =
    df(rows, "g", "bin", "ia")

  test("identical distributions: zero TV, KS, chi-square") {
    val rows = for (b <- 0L to 4L; p <- Seq(true, false); _ <- 1 to 10)
      yield ("g1", b, p)
    val out = Drift.histogramDrift(sample(rows), "g", "bin", col("ia"))
      .collect()(0)
    assert(out.getAs[Long]("tv_bp") === 0L)
    assert(out.getAs[Long]("ks_bp") === 0L)
    assert(out.getAs[Long]("chi2_micro") === 0L)
  }

  test("disjoint supports: TV = KS = 10000 bp") {
    val rows = (1 to 10).map(_ => ("g1", 0L, true)) ++
      (1 to 10).map(_ => ("g1", 1L, false))
    val out = Drift.histogramDrift(sample(rows), "g", "bin", col("ia"))
      .collect()(0)
    assert(out.getAs[Long]("tv_bp") === 10000L)
    assert(out.getAs[Long]("ks_bp") === 10000L)
  }

  test("hand-computed asymmetric case") {
    // A: bin0=3, bin1=1 (na=4); B: bin0=1, bin1=3 (nb=4)
    // TV = 0.5*(|3/4-1/4| + |1/4-3/4|) = 0.5 -> 5000 bp
    // chi2 = N * sum d^2/(na*nb*(a+b)) with d = a*nb-b*na = 8, -8:
    //   8 * (64/(16*4) + 64/(16*4)) = 8 * 2 = 16 -> 16_000_000 micro
    val rows = Seq.fill(3)(("g1", 0L, true)) ++ Seq(("g1", 1L, true)) ++
      Seq(("g1", 0L, false)) ++ Seq.fill(3)(("g1", 1L, false))
    val out = Drift.histogramDrift(sample(rows), "g", "bin", col("ia"))
      .collect()(0)
    assert(out.getAs[Long]("na") === 4L)
    assert(out.getAs[Long]("nb") === 4L)
    assert(out.getAs[Long]("tv_bp") === 5000L)
    // KS: |F_a - F_b| after bin0 = |3/4 - 1/4| = 0.5 -> 5000 bp
    assert(out.getAs[Long]("ks_bp") === 5000L)
    assert(out.getAs[Long]("chi2_micro") === 16000000L)
  }

  test("groups are independent") {
    val rows = Seq(("a", 0L, true), ("a", 0L, false),
      ("b", 0L, true), ("b", 1L, false))
    val out = Drift.histogramDrift(sample(rows), "g", "bin", col("ia"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("tv_bp")).toMap
    assert(out === Map("a" -> 0L, "b" -> 10000L))
  }
}
