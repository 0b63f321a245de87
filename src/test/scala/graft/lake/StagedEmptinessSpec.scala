package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.MergeData

/** OPTIMIZATION_r17 §7 pinned: row-level paths read their emptiness /
  * no-match answer off the STAGED tombstone/DV write's footer instead
  * of a separate Spark probe job. These tests pin the refusal/no-op
  * contracts AND that the staging discipline leaves nothing behind —
  * the new failure mode a staged-first write could introduce. */
class StagedEmptinessSpec extends SparkSpec {

  private def state(d: DataFrame): Set[(String, Long, Double)] =
    d.select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private def freshLake(keys: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ses").toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0)),
        "site", "id", "v"),
      dir.getAbsolutePath, keys = keys)
    Versioned.init(spark, dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  /** Relative paths of every file physically present under `sub`. */
  private def filesUnder(dir: String, sub: String): Set[String] = {
    val root = new java.io.File(dir, sub)
    if (!root.exists()) return Set.empty
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).map(_.getName).toSet
  }

  private def noStagingLeft(dir: String): Unit =
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_staging_")),
      "a staged write directory survived")

  test("mergeIntoMor: empty batch refused off the staged tombstone's footer — no commit, no staged leftovers") {
    val dir = freshLake(Seq("site"))
    val v0 = Versioned.currentVersion(spark, dir)
    val empty = df(Seq(("a", 1L, 1.0)), "site", "id", "v").limit(0)
    val e = intercept[IllegalArgumentException] {
      Versioned.mergeIntoMor(spark, dir, empty, Seq("site"), Seq("id"))
    }
    assert(e.getMessage.contains("empty batch"))
    assert(Versioned.currentVersion(spark, dir) == v0, "no version minted")
    assert(filesUnder(dir, "_deletes").isEmpty,
      "the refused batch's staged tombstone must be deleted")
    noStagingLeft(dir)
  }

  test("mergeIntoMor: all-deletes batch — tombstone-only commit, zero insert files, no schema-only stray (partitioned and unpartitioned)") {
    for (keys <- Seq(Seq("site"), Seq.empty[String])) {
      val dir = freshLake(keys)
      val v0 = Versioned.currentVersion(spark, dir)
      val live0 = Versioned.filesAt(spark, dir, v0).toSet
      val b = df(Seq(("a", 1L, 1.0)), "site", "id", "v")
        .withColumn("__delete", lit(true))
      val v1 = Versioned.mergeIntoMor(spark, dir, b, keys, Seq("id"))
      assert(v1 == v0 + 1)
      // MOR delete: live DATA files unchanged, row hidden by the key
      assert(Versioned.filesAt(spark, dir, v1).toSet == live0,
        "an all-deletes MOR merge must add no data files")
      assert(state(Versioned.snapshot(spark, dir)) ==
        Set(("a", 2L, 2.0), ("b", 10L, 10.0)))
      noStagingLeft(dir)
    }
  }

  test("deleteWhere: no-match predicate — no commit, staged tombstone reclaimed") {
    val dir = freshLake(Seq("site"))
    val v0 = Versioned.currentVersion(spark, dir)
    val before = filesUnder(dir, "_deletes")
    val v = Versioned.deleteWhere(spark, dir, col("id") === 999L, Seq("id"))
    assert(v == v0, "no-match deleteWhere must not commit")
    assert(filesUnder(dir, "_deletes") == before,
      "no-match deleteWhere must reclaim its staged tombstone")
    // and a MATCH still commits exactly one tombstone
    val v1 = Versioned.deleteWhere(spark, dir, col("id") === 1L, Seq("id"))
    assert(v1 == v0 + 1)
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 2L, 2.0), ("b", 10L, 10.0)))
  }

  test("updateWhereVectors / deleteWhereVectors: no-match — no commit, staged DV reclaimed; match still lands") {
    val dir = freshLake(Seq("site"))
    val v0 = Versioned.currentVersion(spark, dir)
    assert(Versioned.updateWhereVectors(spark, dir, col("id") === 999L,
      Map("v" -> lit(5.0)), Seq("site")) == v0)
    assert(Versioned.deleteWhereVectors(spark, dir,
      col("id") === 999L) == v0)
    assert(filesUnder(dir, "_deletes").isEmpty,
      "no-match vector ops must reclaim their staged DV files")
    noStagingLeft(dir)
    val v1 = Versioned.deleteWhereVectors(spark, dir, col("id") === 10L)
    assert(v1 == v0 + 1)
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 1.0), ("a", 2L, 2.0)))
  }

  test("uniform footer schema serves the un-evolved read; an evolved lake still merges (null-fills the late column)") {
    val dir = freshLake(Seq("site"))
    // un-evolved: snapshot schema comes off the uniform footers
    assert(Versioned.snapshot(spark, dir).columns.toSeq ==
      Seq("id", "v", "site"))
    // evolve: append a batch carrying a NEW column — footers now
    // genuinely disagree, so the read must fall back to the
    // distributed merge and null-fill the old files
    Versioned.append(spark, dir,
      df(Seq(("c", 30L, 30.0, "x")), "site", "id", "v", "tag"),
      Seq("site"))
    val snap = Versioned.snapshot(spark, dir)
    assert(snap.columns.contains("tag"))
    val tags = snap.select("id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(tags(30L).contains("x") && tags(1L).isEmpty,
      "evolved read must null-fill pre-evolution files")
  }
}
