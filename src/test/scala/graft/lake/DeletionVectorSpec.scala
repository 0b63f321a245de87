package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.MergeData

/** Positional deletion vectors ([[Versioned.deleteWhereVectors]],
  * protocol level 5): arbitrary-predicate MOR deletes as (file,
  * row-ordinal) sidecars — O(matched rows) written, ZERO partition
  * rewrites — applied at read as one positional anti-join, riding the
  * `#del` rail for carry/fold/vacuum/refusal discipline. */
class DeletionVectorSpec extends SparkSpec {

  private def state(d: DataFrame): Set[(String, Long, Double)] =
    d.select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private val baseRows = Seq(
    ("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0),
    ("b", 11L, 11.0), ("c", 20L, 20.0))

  private def freshLake(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_dv").toFile
    root.deleteOnExit()
    val lake = new java.io.File(root, "lake").getAbsolutePath
    MergeData.writeMerged(spark, df(baseRows, "site", "id", "v"),
      lake, keys = Seq("site"))
    Versioned.init(spark, lake, commitTs = 1000L)
    lake
  }

  test("predicate delete: ZERO data-file changes, read == filter, travel intact, vectors stack, no-op on no-match") {
    val dir = freshLake()
    val files0 = Versioned.filesAt(spark, dir).toSet
    val v1 = Versioned.deleteWhereVectors(spark, dir, col("v") > 9.5)
    assert(v1 == 1L)
    assert(Versioned.filesAt(spark, dir).toSet == files0,
      "a deletion-vector commit must not add, drop or rewrite data files")
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 1.0), ("a", 2L, 2.0)))
    assert(state(Versioned.snapshot(spark, dir, 0L)) == baseRows.toSet,
      "pre-delete version still travels")
    // a second vector STACKS (both apply)
    val v2 = Versioned.deleteWhereVectors(spark, dir, col("id") === 1L)
    assert(state(Versioned.snapshot(spark, dir)) == Set(("a", 2L, 2.0)))
    // already-deleted rows are invisible to the predicate: no-op
    assert(Versioned.deleteWhereVectors(spark, dir, col("v") > 9.5) == v2)
    assert(Versioned.deleteWhereVectors(spark, dir, col("id") === 999L) == v2)
    // count of pending delete files matches the two commits
    assert(Versioned.deleteFilesAt(spark, dir, v2).nonEmpty)
  }

  test("format + pruned reads apply vectors; CDF publishes exactly the visible deleted rows") {
    val dir = freshLake()
    Versioned.enableChangeFeed(spark, dir, Seq("site", "id"))
    val vPre = Versioned.currentVersion(spark, dir)
    val v1 = Versioned.deleteWhereVectors(spark, dir,
      col("site") === "b" || col("v") < 1.5)
    val expect = Set(("a", 2L, 2.0), ("c", 20L, 20.0))
    assert(state(Versioned.snapshot(spark, dir)) == expect)
    // the format surface (fast path falls back / upgrades under MOR)
    assert(state(spark.read.format("graft").load(dir)) == expect,
      "format reads must apply deletion vectors")
    // SQL catalog read
    spark.conf.set("spark.sql.catalog.graft_dv", "graft.sources.GraftCatalog")
    assert(state(spark.sql(s"SELECT * FROM graft_dv.`$dir`")) == expect)
    // CDF rows = exactly the rows a reader saw disappear
    val acts = Versioned.changesBetween(spark, dir, vPre, v1)
      .filter(col("_action") === "delete")
      .select("site", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(acts == Set(("a", 1L), ("b", 10L), ("b", 11L)))
  }

  test("interplay: OPTIMIZE folds vectors on rewrite (no resurrection), materializeDeletes clears them, vacuum keeps referenced vector files") {
    val dir = freshLake()
    // several small files so optimize has work
    Versioned.append(spark, dir, df(Seq(("a", 3L, 3.0)), "site", "id", "v"),
      Seq("site"))
    Versioned.deleteWhereVectors(spark, dir, col("id").isin(2L, 3L, 10L))
    val expect = Set(("a", 1L, 1.0), ("b", 11L, 11.0), ("c", 20L, 20.0))
    assert(state(Versioned.snapshot(spark, dir)) == expect)
    // OPTIMIZE rewrites partitions: the rewrite must read the
    // DV-filtered view (a carried vector names dropped files and can
    // never resurrect a row)
    val vOpt = Versioned.optimize(spark, dir, Seq("site"))
    assert(state(Versioned.snapshot(spark, dir, vOpt)) == expect,
      "optimize must fold deletion vectors into the rewrite")
    // materializeDeletes drops the #del lines entirely
    val vMat = Versioned.materializeDeletes(spark, dir, Seq("site"))
    assert(Versioned.deleteFilesAt(spark, dir, vMat).isEmpty)
    assert(state(Versioned.snapshot(spark, dir)) == expect)
    // a fresh vector, then vacuum: the referenced DV file must survive
    // the reap (reference-gated like any tombstone)
    Versioned.deleteWhereVectors(spark, dir, col("id") === 20L)
    Versioned.vacuum(spark, dir, keepVersions = 1)
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 1.0), ("b", 11L, 11.0)),
      "vacuum must keep deletion-vector files the current version references")
  }

  test("interplay: appends, COW update, MOR merge and equality tombstones all compose with pending vectors") {
    val dir = freshLake()
    Versioned.deleteWhereVectors(spark, dir, col("id") === 10L)
    // append under a pending DV: fresh files can't be referenced — no
    // collision refusal, rows land
    Versioned.append(spark, dir, df(Seq(("b", 10L, 99.0)), "site", "id", "v"),
      Seq("site"))
    assert(state(Versioned.snapshot(spark, dir)).contains(("b", 10L, 99.0)),
      "a re-inserted row must NOT be hidden by a positional vector " +
        "(that is the equality tombstone's contract, not the DV's)")
    // COW update: touched partitions rewrite from the DV-filtered view
    Versioned.updateWhere(spark, dir, col("id") === 11L,
      Map("v" -> lit(111.0)), Seq("site"))
    assert(state(Versioned.snapshot(spark, dir)) == Set(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 99.0),
      ("b", 11L, 111.0), ("c", 20L, 20.0)))
    // MOR merge: DV lines pass through untouched
    Versioned.mergeIntoMor(spark, dir,
      df(Seq(("c", 21L, 21.0)), "site", "id", "v"),
      Seq("site"), Seq("site", "id"))
    assert(state(Versioned.snapshot(spark, dir)).contains(("c", 21L, 21.0)))
    // an equality tombstone stacks on top of vectors
    Versioned.deleteWhere(spark, dir, col("id") === 1L, Seq("site", "id"))
    assert(state(Versioned.snapshot(spark, dir)) == Set(
      ("a", 2L, 2.0), ("b", 10L, 99.0), ("b", 11L, 111.0),
      ("c", 20L, 20.0), ("c", 21L, 21.0)))
    // fastRowCount refuses while any MOR state pends (vectors included)
    intercept[IllegalArgumentException] { Versioned.fastRowCount(spark, dir) }
  }

  test("column mapping: vectors written against a renamed table read back right (logical predicate, physical files)") {
    val dir = freshLake()
    Versioned.renameColumn(spark, dir, "v", "reading")
    Versioned.deleteWhereVectors(spark, dir, col("reading") > 9.5)
    val got = Versioned.snapshot(spark, dir)
      .select("site", "id", "reading").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("a", 1L, 1.0), ("a", 2L, 2.0)))
    assert(spark.read.format("graft").load(dir).count() == 2L)
  }

  test("RESTORE across a vector commit re-publishes its state; clone refuses pending vectors") {
    val dir = freshLake()
    val v1 = Versioned.deleteWhereVectors(spark, dir, col("site") === "b")
    Versioned.materializeDeletes(spark, dir, Seq("site"))
    // restore back TO the vector state: del lines + DV files re-publish
    val vR = Versioned.restore(spark, dir, v1)
    assert(state(Versioned.snapshot(spark, dir, vR)) ==
      Set(("a", 1L, 1.0), ("a", 2L, 2.0), ("c", 20L, 20.0)))
    val e = intercept[IllegalArgumentException] {
      Versioned.cloneAt(spark, dir,
        java.nio.file.Files.createTempDirectory("graft_dvc")
          .toFile.getAbsolutePath + "/c")
    }
    assert(e.getMessage.contains("tombstone"), e.getMessage)
  }
}
