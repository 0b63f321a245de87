package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkSpec}
import graft.lake.Versioned
import graft.ops.MergeData

/** [[GraftVectorizedReads]]: row-based graft reads (catalog scans, MOR
  * windows) re-plan onto the vectorized fast path with tombstones as a
  * post-scan anti-join — values must be EXACTLY the snapshot core's in
  * every combination (global tombstones, scoped chains, mapping+MOR),
  * and the plan shape is asserted, not assumed. */
class GraftVectorizedReadsSpec extends SparkSpec {

  GraftExtensions.register(spark)
  spark.conf.set("spark.sql.catalog.graft_vec", "graft.sources.GraftCatalog")

  private def state(d: DataFrame): Set[(String, Long, Double)] =
    d.select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private def freshLake(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_vec").toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0),
        ("c", 20L, 20.0)), "site", "id", "v"),
      dir.getAbsolutePath, keys = Seq("site"))
    Versioned.init(spark, dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  private def scansOf(d: DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        walk(a.executedPlan) // AQE wraps joins; collect stops at the wrapper
    }.flatten
    walk(d.queryExecution.executedPlan)
  }

  private def assertVectorized(d: DataFrame): Unit = {
    val ss = scansOf(d)
    assert(ss.nonEmpty, "upgraded read must plan a FileSourceScan")
    assert(ss.exists(_.relation.location.isInstanceOf[GraftFileIndex]),
      "upgraded read must scan through the manifest FileIndex")
    assert(ss.forall(_.supportsColumnar), "scan must stay columnar")
  }

  test("catalog SQL reads re-plan vectorized: steady state and VERSION AS OF, values == snapshot") {
    val dir = freshLake()
    Versioned.append(spark, dir, df(Seq(("a", 3L, 3.0)), "site", "id", "v"),
      Seq("site"))
    val cur = spark.sql(s"SELECT * FROM graft_vec.`$dir`")
    assertVectorized(cur)
    assert(state(cur) == state(Versioned.snapshot(spark, dir)))
    val v0 = spark.sql(s"SELECT * FROM graft_vec.`$dir` VERSION AS OF 0")
    assertVectorized(v0)
    assert(state(v0) == state(Versioned.snapshot(spark, dir, 0L)))
  }

  test("MOR window reads re-plan vectorized with a post-scan anti-join: global tombstone, scoped chain, mapping+MOR — all == snapshot") {
    val dir = freshLake()
    // GLOBAL tombstone (deleteWhere) pending
    Versioned.deleteWhere(spark, dir, col("id") === 10L, Seq("site", "id"))
    val read1 = spark.read.format("graft").load(dir)
    assertVectorized(read1)
    assert(read1.queryExecution.executedPlan.toString.contains("LeftAnti"),
      "pending tombstones must apply as an anti-join above the scan")
    assert(state(read1) == state(Versioned.snapshot(spark, dir)))
    assert(!state(read1).exists(_._2 == 10L), "tombstoned row stays hidden")
    // SCOPED chain on top (mergeIntoMor twice on one key): the second
    // bound hides the first merge's insert, the second's survives —
    // the exempt-set arithmetic must survive the upgrade
    Versioned.materializeDeletes(spark, dir, Seq("site"))
    Versioned.mergeIntoMor(spark, dir,
      df(Seq(("a", 1L, 100.0, false), ("a", 2L, 0.0, true)),
        "site", "id", "v", "__delete"), Seq("site"), Seq("site", "id"))
    Versioned.mergeIntoMor(spark, dir,
      df(Seq(("a", 1L, 500.0, false)), "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"))
    val read2 = spark.read.format("graft").load(dir)
    assertVectorized(read2)
    assert(state(read2) == state(Versioned.snapshot(spark, dir)))
    assert(state(read2) == Set(("a", 1L, 500.0), ("c", 20L, 20.0)))
    // MAPPING + MOR combined: rename while tombstones pend — keys lift
    // physical->logical for the anti-join
    Versioned.renameColumn(spark, dir, "v", "reading")
    val read3 = spark.read.format("graft").load(dir)
      .withColumnRenamed("reading", "v")
    assertVectorized(read3)
    assert(state(read3) == Set(("a", 1L, 500.0), ("c", 20L, 20.0)))
    // catalog leg over the same mapped+MOR state agrees
    val sqlRead = spark.sql(
      s"SELECT site, id, reading AS v FROM graft_vec.`$dir`")
    assertVectorized(sqlRead)
    assert(state(sqlRead) == Set(("a", 1L, 500.0), ("c", 20L, 20.0)))
  }

  test("ordering contract: SQL MERGE over a catalog table still lowers (the mutation wins the leaf before the upgrade)") {
    val dir = freshLake()
    df(Seq(("a", 1L, 42.0)), "site", "id", "v")
      .createOrReplaceTempView("vec_merge_src")
    spark.sql(
      s"""MERGE INTO graft_vec.`$dir` t USING vec_merge_src s
         |ON t.site = s.site AND t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(state(Versioned.snapshot(spark, dir)).contains(("a", 1L, 42.0)))
  }

  test("empty tables stay on the anchor-backed snapshot path (no upgrade, typed zero rows)") {
    val dir = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_vec_e").toFile,
      "t").getAbsolutePath
    spark.sql(s"CREATE TABLE graft_vec.`$dir` " +
      "(id BIGINT, v DOUBLE, site STRING) PARTITIONED BY (site)")
    val empty = spark.sql(s"SELECT * FROM graft_vec.`$dir`")
    assert(empty.count() == 0L)
    assert(empty.schema.fieldNames.toSet == Set("id", "v", "site"))
  }
}
