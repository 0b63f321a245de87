package graft.lake

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {
  import Maintenance._

  test("mortonKey interleaves bits (a→odd positions, b→even)") {
    val d = df(Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (65535L, 65535L)),
      "a", "b")
      .select(mortonKey(col("a"), col("b")).as("z"))
    // morton(5,3): a bits 0,2 → positions 1,5 (2+32); b bits 0,1 →
    // positions 0,2 (1+4) = 39; 16-bit all-ones interleaves to 2^32-1
    assert(rowsOf(d).map(_.head) == Seq(0L, 2L, 1L, 39L, 4294967295L))
  }

  test("mortonKey monotone on the diagonal") {
    // z(k,k) with identical coordinates = 3 * spread(k); strictly
    // increasing along the diagonal — a sanity pin that ordering by z
    // respects locality
    val d = df((0L until 16L).map(Tuple1(_)), "k")
      .select(mortonKey(col("k"), col("k")).as("z"))
    val zs = rowsOf(d).map(_.head.asInstanceOf[Long])
    assert(zs == zs.sorted && zs.distinct.size == zs.size)
  }

  test("mortonKeyN: 2-dim case equals mortonKey exactly; N-dim matches a bit-level model; diagonal stays monotone") {
    // 2-dim equivalence on a value sweep
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (12345L, 54321L),
      (65535L, 65535L))
    val two = df(pairs, "a", "b").select(
      mortonKey(col("a"), col("b")).as("m"),
      mortonKeyN(Seq(col("a"), col("b"))).as("mn"))
    rowsOf(two).foreach(r => assert(r(0) == r(1), s"2-dim mismatch: $r"))
    // 3-dim against a Scala bit model: bit i of dim j → i*3 + (2-j)
    def model(vs: Seq[Long], bits: Int): Long = {
      val n = vs.length
      (for {
        i <- 0 until bits
        j <- 0 until n
      } yield ((vs(j) >> i) & 1L) << (i * n + (n - 1 - j))).sum
    }
    val triples = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L),
      (0L, 0L, 1L), (5L, 3L, 6L), (1023L, 511L, 255L))
    val three = df(triples, "a", "b", "c").select(
      mortonKeyN(Seq(col("a"), col("b"), col("c")), bits = 10).as("z"))
    assert(rowsOf(three).map(_.head) ==
      triples.map { case (a, b, c) => model(Seq(a, b, c), 10) })
    // earlier columns more significant within a bit group: (1,0,0)
    // beats (0,1,0) beats (0,0,1)
    assert(model(Seq(1L, 0L, 0L), 1) > model(Seq(0L, 1L, 0L), 1))
    assert(model(Seq(0L, 1L, 0L), 1) > model(Seq(0L, 0L, 1L), 1))
    // diagonal monotone in 3 dims
    val zs = rowsOf(df((0L until 16L).map(Tuple1(_)), "k")
        .select(mortonKeyN(Seq(col("k"), col("k"), col("k")), 5).as("z")))
      .map(_.head.asInstanceOf[Long])
    assert(zs == zs.sorted && zs.distinct.size == zs.size)
    // n*bits > 63 refuses
    intercept[IllegalArgumentException] {
      mortonKeyN(Seq(col("a"), col("b"), col("c")), bits = 22)
    }
  }

  test("gridBucket clamps and scales to the 2^bits grid") {
    val d = df(Seq(-5.0, 0.0, 50.0, 100.0, 999.0).map(Tuple1(_)), "v")
      .select(gridBucket(col("v"), 0.0, 100.0, bits = 4).as("g"))
    // 4-bit grid: 15 cells; -5 clamps to 0, 999 clamps to 15, 50 → 7
    assert(rowsOf(d).map(_.head) == Seq(0L, 0L, 7L, 15L, 15L))
  }

  test("compactionPlan flags only over-fragmented or small-file partitions") {
    // inventory shape = PathModel.listFiles: (path, size)
    val inv = df(Seq(
      // p=a: 3 healthy files — below maxFiles, none small
      ("lake/p=a/f1", 900L), ("lake/p=a/f2", 800L), ("lake/p=a/f3", 700L),
      // p=b: 5 files — over maxFiles
      ("lake/p=b/f1", 500L), ("lake/p=b/f2", 500L), ("lake/p=b/f3", 500L),
      ("lake/p=b/f4", 500L), ("lake/p=b/f5", 500L),
      // p=c: 2 files but one tiny — small-file debt
      ("lake/p=c/f1", 900L), ("lake/p=c/f2", 10L)),
      "path", "size")
    val plan = Maintenance.compactionPlan(inv,
        regexp_extract(col("path"), "p=([a-z])", 1),
        maxFiles = 4, minBytes = 100L, targetBytes = 1000L)
      .orderBy("partition")
    assert(rowsOf(plan.select("partition", "needs_compaction", "target_files")) ==
      Seq(Seq("a", false, 3L), Seq("b", true, 3L), Seq("c", true, 1L)))
  }

  test("compact rewrites a scattered layout into few z-clustered files") {
    import spark.implicits._
    // 4k rows over a 64x64 (a,b) grid, scattered across 16 files by a
    // hash — the post-ingest worst case: every file spans the domain
    val rows = (0 until 4096).map { i => (i.toLong % 64, (i / 64).toLong, i.toLong) }
    val src = rows.toDF("a", "b", "payload")
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toFile
    dir.deleteOnExit()
    val scattered = new java.io.File(dir, "scattered").getAbsolutePath
    val compacted = new java.io.File(dir, "compacted").getAbsolutePath
    src.repartition(16, col("payload")).write.parquet(scattered)

    val sdf = spark.read.parquet(scattered)
    compact(sdf, mortonKey(col("a"), col("b"), bits = 6), nFiles = 4, compacted)
    val cdf = spark.read.parquet(compacted)

    // (1) lossless: same rows, layout column not leaked into the data
    assert(cdf.columns.toSeq.sorted == Seq("a", "b", "payload"))
    assert(cdf.count() == 4096 &&
      cdf.exceptAll(src).isEmpty && src.exceptAll(cdf).isEmpty)

    // (2) fewer files
    def nFiles(p: String): Long = spark.read.parquet(p)
      .select(input_file_name()).distinct().count()
    assert(nFiles(scattered) == 16 && nFiles(compacted) == 4)

    // (3) skipping health: in the scattered layout every file spans
    // ~the full domain of BOTH dimensions; z-clustering must tighten
    // the total per-file spread in EACH dimension (the point of
    // interleaving vs a plain single-column sort)
    def totalSpread(p: String, c: String): Long =
      fileSpread(spark.read.parquet(p), col(c))
        .agg(sum(col("hi").cast("long") - col("lo").cast("long")))
        .collect()(0).getLong(0)
    val (sa, sb) = (totalSpread(scattered, "a"), totalSpread(scattered, "b"))
    val (ca, cb) = (totalSpread(compacted, "a"), totalSpread(compacted, "b"))
    // scattered: every file spans ~the full 0..63 domain (hash layout
    // may miss the odd extreme value in a file — bound, don't pin)
    assert(sa >= 15 * 63 && sb >= 15 * 63)
    assert(ca <= sa / 2 && cb <= sb / 2,
      s"z-compaction should tighten both dims: a $sa->$ca, b $sb->$cb")
  }

  test("quantileBucket: native rank expression equals the legacy when-tree and the lower_bound model (doubles incl. NaN/null, strings, cut-boundary ties)") {
    import org.apache.spark.sql.Column
    // the pre-r17 composed form, rebuilt verbatim as the twin
    def legacy(c: Column, cuts: Seq[Column]): Column = {
      def tree(lo: Int, hi: Int): Column =
        if (lo >= hi) lit(lo.toLong)
        else {
          val mid = (lo + hi) / 2
          when(c < cuts(mid), tree(lo, mid)).otherwise(tree(mid + 1, hi))
        }
      when(c.isNull, lit(0L)).otherwise(tree(0, cuts.size))
    }
    val dCuts = Seq(-3.5, 0.0, 1.0, 7.25, 100.0)
    val dVals: Seq[java.lang.Double] = Seq(-10.0, -3.5, -3.4999, 0.0, 0.5,
      1.0, 7.25, 99.9, 100.0, 1e9, Double.NaN, null)
      .map(v => if (v == null) null
        else java.lang.Double.valueOf(v.asInstanceOf[Double]))
    val ddf = spark.createDataFrame(
      spark.sparkContext.parallelize(dVals.map(org.apache.spark.sql.Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))))
    val dOut = ddf.select(
      quantileBucket(col("v"), dCuts.map(lit(_))).as("fast"),
      legacy(col("v"), dCuts.map(lit(_))).as("slow"),
      col("v")).collect()
    dOut.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"double mismatch at ${r.get(2)}: fast=${r.getLong(0)} slow=${r.getLong(1)}")
      // lower_bound model (Java < : NaN lands past every cut)
      val model = if (r.isNullAt(2)) 0L
        else dCuts.count(cut => !(r.getDouble(2) < cut)).toLong
      assert(r.getLong(0) == model)
    }
    val sCuts = Seq("b", "f", "mm", "z")
    val sVals = Seq("a", "b", "c", "f", "g", "mm", "mz", "z", "zz", null)
    val sdf = spark.createDataFrame(
      spark.sparkContext.parallelize(sVals.map(org.apache.spark.sql.Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    val sOut = sdf.select(
      quantileBucket(col("v"), sCuts.map(lit(_))).as("fast"),
      legacy(col("v"), sCuts.map(lit(_))).as("slow"), col("v")).collect()
    sOut.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"string mismatch at ${r.get(2)}: fast=${r.getLong(0)} slow=${r.getLong(1)}")
    }
    // NON-literal cuts keep the legacy tree path and still agree
    val mixed = ddf.select(
      quantileBucket(col("v"), Seq(lit(0.0), col("v") * 0 + 1.0)).as("fast"),
      legacy(col("v"), Seq(lit(0.0), col("v") * 0 + 1.0)).as("slow")).collect()
    mixed.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
