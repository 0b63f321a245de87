package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.MergeData

/** The COW mutation primitives behind the SQL surface:
  * [[Versioned.updateWhere]] and [[Versioned.deleteWhereCow]] —
  * partition-scoped rewrites with the full commit discipline
  * (constraints, generated re-validation, change feed, time travel,
  * untouched partitions byte-identical). */
class UpdateDeleteWhereSpec extends SparkSpec {

  private def state(d: DataFrame): Set[(String, Long, Double)] =
    d.select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private def freshLake(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_udw").toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0),
        ("c", 20L, 20.0)), "site", "id", "v"),
      dir.getAbsolutePath, keys = Seq("site"))
    Versioned.init(spark, dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  test("updateWhere: partition-scoped COW — matching rows change, untouched partitions keep their exact files, time travel intact") {
    val dir = freshLake()
    val before = Versioned.filesAt(spark, dir)
    val v1 = Versioned.updateWhere(spark, dir,
      col("site") === "a" && col("id") === 1L,
      Map("v" -> (col("v") * 100)), Seq("site"))
    assert(v1 == 1L)
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 100.0), ("a", 2L, 2.0), ("b", 10L, 10.0),
        ("c", 20L, 20.0)))
    // partitions b and c are NOT touched: same manifest refs
    val after = Versioned.filesAt(spark, dir).toSet
    val untouched = before.filter(r =>
      r.contains("site=b") || r.contains("site=c"))
    assert(untouched.nonEmpty && untouched.forall(after.contains),
      "update must not rewrite partitions without a matching row")
    assert(before.filter(_.contains("site=a")).forall(f => !after.contains(f)),
      "the matched partition must be rewritten")
    // pre-update state still travels
    assert(state(Versioned.snapshot(spark, dir, 0L)) ==
      Set(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0), ("c", 20L, 20.0)))
    // no-match predicate: no-op, no commit
    assert(Versioned.updateWhere(spark, dir, col("id") === 999L,
      Map("v" -> lit(0.0)), Seq("site")) == v1)
    assert(Versioned.currentVersion(spark, dir) == v1)
  }

  test("updateWhere: refusals — unknown column, partition column, constraint violation, global-tombstone key") {
    val dir = freshLake()
    intercept[IllegalArgumentException] {
      Versioned.updateWhere(spark, dir, lit(true),
        Map("nope" -> lit(1)), Seq("site"))
    }
    intercept[IllegalArgumentException] {
      Versioned.updateWhere(spark, dir, lit(true),
        Map("site" -> lit("z")), Seq("site"))
    }
    Versioned.addConstraint(spark, dir, "v_pos", "v > 0")
    val e = intercept[IllegalArgumentException] {
      Versioned.updateWhere(spark, dir, col("id") === 1L,
        Map("v" -> lit(-5.0)), Seq("site"))
    }
    assert(e.getMessage.contains("v_pos"))
    assert(state(Versioned.snapshot(spark, dir)).contains(("a", 1L, 1.0)),
      "a refused update must leave the table untouched")
    // pending UNSCOPED equality delete keyed on (site, id): updating v
    // is fine, updating id is refused
    Versioned.deleteWhere(spark, dir, col("id") === 20L, Seq("site", "id"))
    Versioned.updateWhere(spark, dir, col("id") === 1L,
      Map("v" -> lit(7.0)), Seq("site"))
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 7.0), ("a", 2L, 2.0), ("b", 10L, 10.0)))
    val e2 = intercept[IllegalArgumentException] {
      Versioned.updateWhere(spark, dir, col("id") === 1L,
        Map("id" -> lit(99L)), Seq("site"))
    }
    assert(e2.getMessage.contains("materializeDeletes"))
  }

  test("updateWhere: generated columns re-validate (breaking an invariant refuses; benign updates pass); change feed publishes pre/post images") {
    val dir = freshLake()
    Versioned.addGeneratedColumn(spark, dir, "v2x", "v * 2")
    Versioned.enableChangeFeed(spark, dir, Seq("site", "id"))
    val v0 = Versioned.currentVersion(spark, dir)
    // an update that does NOT touch a generated input's invariant
    // partner is refused (v feeds v2x)
    val e = intercept[IllegalArgumentException] {
      Versioned.updateWhere(spark, dir, col("id") === 10L,
        Map("v" -> lit(11.0)), Seq("site"))
    }
    assert(e.getMessage.contains("v2x"),
      s"generated invariant must catch the broken pair: ${e.getMessage}")
    // assigning a non-input column passes and feeds the change feed
    val v1 = Versioned.updateWhere(spark, dir, col("id") === 10L,
      Map("id" -> lit(11L)), Seq("site"))
    assert(v1 == v0 + 1)
    val inc = Versioned.changesBetween(spark, dir, v0, v1)
    val acts = inc.select("_action", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(acts == Set(("update_preimage", 10L), ("update_postimage", 11L)))
  }

  test("deleteWhereCow: arbitrary-predicate delete — rows gone, emptied partition drops its files, survivors byte-identical, CDF rows") {
    val dir = freshLake()
    Versioned.enableChangeFeed(spark, dir, Seq("site", "id"))
    val v0 = Versioned.currentVersion(spark, dir)
    val before = Versioned.filesAt(spark, dir)
    // delete ALL of partition c plus one row of a (v > 1.5 keeps a@1)
    val v1 = Versioned.deleteWhereCow(spark, dir,
      col("site") === "c" || (col("site") === "a" && col("v") > 1.5),
      Seq("site"))
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 1.0), ("b", 10L, 10.0)))
    val after = Versioned.filesAt(spark, dir).toSet
    assert(!after.exists(_.contains("site=c")),
      "a fully-deleted partition must disappear from the manifest")
    assert(before.filter(_.contains("site=b")).forall(after.contains),
      "unmatched partitions keep their exact files")
    assert(state(Versioned.snapshot(spark, dir, v0)) ==
      Set(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0), ("c", 20L, 20.0)))
    val acts = Versioned.changesBetween(spark, dir, v0, v1)
      .filter(col("_action") === "delete")
      .select("site", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(acts == Set(("a", 2L), ("c", 20L)))
    // no-match: no-op
    assert(Versioned.deleteWhereCow(spark, dir, col("id") === 999L,
      Seq("site")) == v1)
  }

  // ---- UNPARTITIONED tables: the COW scope is the table root --------
  // (a table created without PARTITIONED BY reaches updateWhere /
  // deleteWhereCow / materializeDeletes with EMPTY partition keys; the
  // scope must degrade to a full-table rewrite, not crash on an
  // empty reduce or keep the old files beside the rewrite)

  private def freshFlatLake(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_udwf").toFile
    root.deleteOnExit()
    val dir = new java.io.File(root, "lake").getAbsolutePath
    df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0),
      ("c", 20L, 20.0)), "site", "id", "v")
      .coalesce(2).write.parquet(dir)
    Versioned.init(spark, dir)
    assert(Versioned.layoutPartitionKeys(spark, dir).isEmpty)
    dir
  }

  test("updateWhereVectors: MOR update — DV hides the pre-images, post-images append, ZERO rewrites, count invariant, materialize folds, travel intact") {
    val dir = freshLake()
    val before = Versioned.filesAt(spark, dir)
    // a WIDE update touching every partition: COW would rewrite all
    // three; the DV update rewrites NONE
    val v1 = Versioned.updateWhereVectors(spark, dir,
      col("id") >= 2L, Map("v" -> (col("v") + 1000)), Seq("site"))
    assert(v1 == 1L)
    val after = Versioned.filesAt(spark, dir)
    assert(before.forall(after.contains),
      "a DV update must keep every pre-existing file in place")
    assert(after.size > before.size, "post-images land as fresh files")
    assert(Versioned.deleteFilesAt(spark, dir)
      .exists(_.contains("_deletes/dv_")))
    // exactly-once visibility: old rows hidden, new rows visible
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 1.0), ("a", 2L, 1002.0), ("b", 10L, 1010.0),
        ("c", 20L, 1020.0)))
    // an update keeps the row count — and fastRowCount stays exact
    // under the pending vector (base + appended - DV)
    assert(Versioned.fastRowCount(spark, dir) == 4L)
    // pre-update state still travels
    assert(state(Versioned.snapshot(spark, dir, 0L)) ==
      Set(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0),
        ("c", 20L, 20.0)))
    // a SECOND DV update stacks (evaluates on the MOR view)
    Versioned.updateWhereVectors(spark, dir,
      col("v") >= 1010.0, Map("v" -> (col("v") * 2)), Seq("site"))
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 1.0), ("a", 2L, 1002.0), ("b", 10L, 2020.0),
        ("c", 20L, 2040.0)))
    // materialize folds the vectors into plain data
    Versioned.materializeDeletes(spark, dir, Seq("site"))
    assert(Versioned.deleteFilesAt(spark, dir).isEmpty)
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 1.0), ("a", 2L, 1002.0), ("b", 10L, 2020.0),
        ("c", 20L, 2040.0)))
    // refusals mirror updateWhere
    intercept[IllegalArgumentException] {
      Versioned.updateWhereVectors(spark, dir, lit(true),
        Map("site" -> lit("z")), Seq("site")) // partition column
    }
    intercept[IllegalArgumentException] {
      Versioned.updateWhereVectors(spark, dir, lit(true),
        Map("nope" -> lit(1)), Seq("site")) // unknown column
    }
    // no-match no-op
    val vCur = Versioned.currentVersion(spark, dir)
    assert(Versioned.updateWhereVectors(spark, dir,
      col("id") === 999L, Map("v" -> lit(0.0)), Seq("site")) == vCur)
  }

  test("SQL UPDATE routes by cost: a stats-wide predicate takes the DV update (zero rewrites), a narrow one keeps COW; confs override") {
    graft.GraftExtensions.register(spark)
    spark.conf.set("spark.sql.catalog.graft_updv", "graft.sources.GraftCatalog")
    val dir = freshLake()
    (1 to 7).foreach { i => // enough files that one box is < 25%
      Versioned.append(spark, dir,
        df(Seq(("a", 1000L + i * 100, i.toDouble)), "site", "id", "v"),
        Seq("site"))
    }
    Versioned.backfillStats(spark, dir, Seq("id"))
    def tbl = s"graft_updv.`$dir`"
    // WIDE: every id box intersects -> the DV update, nothing rewritten
    val filesPre = Versioned.filesAt(spark, dir)
    spark.sql(s"UPDATE $tbl SET v = v + 0.5 WHERE id >= 0")
    assert(filesPre.forall(Versioned.filesAt(spark, dir).contains),
      "a wide auto-routed UPDATE must rewrite zero files")
    assert(Versioned.deleteFilesAt(spark, dir)
      .exists(_.contains("_deletes/dv_")))
    assert(Versioned.snapshot(spark, dir)
      .filter(col("id") === 10L).select("v").head().getDouble(0) == 10.5)
    // NARROW (one file's box): COW — no new DV entries
    val dvsPre = Versioned.deleteFilesAt(spark, dir).size
    spark.sql(s"UPDATE $tbl SET v = 0.25 WHERE id = 1700")
    assert(Versioned.deleteFilesAt(spark, dir).size == dvsPre,
      "a narrow auto-routed UPDATE must stay COW (no MOR debt)")
    assert(Versioned.snapshot(spark, dir)
      .filter(col("id") === 1700L).select("v").head().getDouble(0) == 0.25)
    // conf veto
    spark.conf.set("spark.graft.sql.update.cow", "true")
    try {
      val dvs2 = Versioned.deleteFilesAt(spark, dir).size
      spark.sql(s"UPDATE $tbl SET v = v WHERE id >= 0")
      assert(Versioned.deleteFilesAt(spark, dir).size == dvs2)
    } finally spark.conf.unset("spark.graft.sql.update.cow")
  }

  test("updateWhere: unpartitioned table — full-table COW rewrite, no duplicated rows, old files dropped, travel intact, no-op on no-match") {
    val dir = freshFlatLake()
    val before = Versioned.filesAt(spark, dir).toSet
    val v1 = Versioned.updateWhere(spark, dir, col("id") === 1L,
      Map("v" -> (col("v") * 100)), Nil)
    assert(v1 == 1L)
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 100.0), ("a", 2L, 2.0), ("b", 10L, 10.0),
        ("c", 20L, 20.0)))
    // EVERY pre-rewrite file must leave the manifest (keeping any would
    // duplicate its rows beside the rewrite)
    val after = Versioned.filesAt(spark, dir).toSet
    assert(before.intersect(after).isEmpty,
      "an unpartitioned COW update must replace every live file")
    assert(state(Versioned.snapshot(spark, dir, 0L)) ==
      Set(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0), ("c", 20L, 20.0)))
    assert(Versioned.updateWhere(spark, dir, col("id") === 999L,
      Map("v" -> lit(0.0)), Nil) == v1)
  }

  test("deleteWhereCow: unpartitioned table — rows gone exactly once, travel intact, no-op on no-match") {
    val dir = freshFlatLake()
    val v1 = Versioned.deleteWhereCow(spark, dir, col("v") > 1.5, Nil)
    assert(v1 == 1L)
    assert(state(Versioned.snapshot(spark, dir)) == Set(("a", 1L, 1.0)))
    assert(state(Versioned.snapshot(spark, dir, 0L)) ==
      Set(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0), ("c", 20L, 20.0)))
    assert(Versioned.deleteWhereCow(spark, dir, col("id") === 999L, Nil) == v1)
  }

  test("materializeDeletes: unpartitioned table — tombstones fold into a full rewrite; matched-nothing tombstones drop metadata-only") {
    val dir = freshFlatLake()
    val v1 = Versioned.deleteWhere(spark, dir,
      col("site") === "a", Seq("site", "id"))
    assert(Versioned.deleteFilesAt(spark, dir, v1).nonEmpty)
    val v2 = Versioned.materializeDeletes(spark, dir, Nil)
    assert(v2 == v1 + 1)
    assert(Versioned.deleteFilesAt(spark, dir, v2).isEmpty)
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("b", 10L, 10.0), ("c", 20L, 20.0)))
    // a tombstone whose rows are already gone: metadata-only commit
    val v3 = Versioned.deleteWhere(spark, dir,
      col("site") === "a", Seq("site", "id"))
    val filesBefore = Versioned.filesAt(spark, dir, v3).toSet
    val v4 = Versioned.materializeDeletes(spark, dir, Nil)
    assert(Versioned.filesAt(spark, dir, v4).toSet == filesBefore,
      "materializing no-hit tombstones must not rewrite data")
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("b", 10L, 10.0), ("c", 20L, 20.0)))
  }
}
