package graft.lake

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkipIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lake: (String, org.apache.spark.sql.DataFrame) = {
    val rows = (0 until 4096).map { i => (i.toLong % 64, (i / 64).toLong, i.toLong) }
    val src = rows.toDF("a", "b", "payload")
    val dir = java.nio.file.Files.createTempDirectory("graft_skipidx").toFile
    dir.deleteOnExit()
    val out = new java.io.File(dir, "z").getAbsolutePath
    Maintenance.compact(src, Maintenance.mortonKey(col("a"), col("b"), 6), 8, out)
    (out, src)
  }

  test("index has one row per (file, column) with true min/max") {
    val (out, _) = lake
    val idx = SkipIndex.build(spark.read.parquet(out), Seq("a", "b"))
    val nFiles = spark.read.parquet(out)
      .select(input_file_name()).distinct().count()
    assert(idx.count() == nFiles * 2)
    // global min/max across index rows must match the data's domain
    val g = idx.groupBy("col").agg(min("lo").as("lo"), max("hi").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(g("a") == (0.0, 63.0) && g("b") == (0.0, 63.0))
    // per-file row counts in the index sum to the table
    assert(idx.filter(col("col") === "a")
      .agg(sum("rows")).collect()(0).getLong(0) == 4096L)
  }

  test("pruned read skips files and still returns exactly the filtered rows") {
    val (out, src) = lake
    val idx = SkipIndex.build(spark.read.parquet(out), Seq("a", "b")).cache()
    val cand = SkipIndex.candidateFiles(idx, "a", 0, 7)
    val total = spark.read.parquet(out).select(input_file_name()).distinct().count()
    assert(cand.nonEmpty && cand.size < total,
      s"z-clustered layout must let a tight range skip files (${cand.size}/$total)")

    val pruned = SkipIndex.prunedRead(spark, out, idx, "a", 0, 7)
    val naive = src.filter(col("a").between(0, 7))
    assert(pruned.count() == naive.count() &&
      pruned.exceptAll(naive).isEmpty && naive.exceptAll(pruned).isEmpty)
  }

  test("conjunctive pruning: two z-dims skip at least as much as either alone") {
    val (out, src) = lake
    val idx = SkipIndex.build(spark.read.parquet(out), Seq("a", "b")).cache()
    val pa = SkipIndex.candidateFiles(idx, "a", 0, 15).toSet
    val pb = SkipIndex.candidateFiles(idx, "b", 0, 15).toSet
    val both = SkipIndex.candidateFilesMulti(idx,
      Seq(("a", 0, 15), ("b", 0, 15))).toSet
    assert(both == (pa intersect pb))
    assert(both.size <= math.min(pa.size, pb.size))
    // z-layout: the conjunction genuinely prunes beyond either dim —
    // a quarter-domain box on a 64x64 z-curve over 8 files must not
    // touch them all
    val total = spark.read.parquet(out).select(input_file_name()).distinct().count()
    assert(both.size < total)
    val pruned = SkipIndex.prunedReadMulti(spark, out, idx,
      Seq(("a", 0, 15), ("b", 0, 15)))
    val naive = src.filter(col("a").between(0, 15) && col("b").between(0, 15))
    assert(pruned.count() == naive.count() &&
      pruned.exceptAll(naive).isEmpty && naive.exceptAll(pruned).isEmpty)
  }

  test("disjoint predicate yields an empty frame with the data schema") {
    val (out, _) = lake
    val idx = SkipIndex.build(spark.read.parquet(out), Seq("a"))
    val d = SkipIndex.prunedRead(spark, out, idx, "a", 1000, 2000)
    assert(d.columns.toSeq.sorted == Seq("a", "b", "payload") && d.count() == 0)
  }
}
