package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Row-level MERGE INTO (copy-on-write): update/delete/insert semantics
  * AND the physical guarantee that only touched partitions rewrite —
  * untouched partition files must remain byte- and mtime-identical,
  * because at lake scale "merge a day's upserts" must never become
  * "rewrite the table".
  */
class MergeIntoSpec extends SparkSpec {

  private def readLake(dir: String) =
    spark.read.parquet(dir).select("site", "id", "v")

  private def state(dir: String): Set[(String, Long, Double)] =
    readLake(dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("mergeInto applies update/delete/insert and leaves other partitions' files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge").toFile
    dir.deleteOnExit()
    val base = df(Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("b", 10L, 10.0), ("b", 11L, 11.0)), "site", "id", "v")
    MergeData.writeMerged(spark, base, dir.getAbsolutePath, keys = Seq("site"))

    def files(p: String): Map[String, Long] = {
      val d = new java.io.File(dir, p)
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val bBefore = files("site=b")

    // batch: UPDATE a/1, DELETE a/2, INSERT a/4 and a whole new
    // partition c/100 — partition b is not in the batch
    val updates = df(Seq(
      ("a", 1L, 100.0, false), ("a", 2L, 0.0, true),
      ("a", 4L, 4.0, false), ("c", 100L, 9.0, false)),
      "site", "id", "v", "__delete")
    MergeData.mergeInto(spark, dir.getAbsolutePath, updates,
      partitionKeys = Seq("site"), rowKey = Seq("site", "id"))

    assert(state(dir.getAbsolutePath) == Set(
      ("a", 1L, 100.0), ("a", 3L, 3.0), ("a", 4L, 4.0),
      ("b", 10L, 10.0), ("b", 11L, 11.0), ("c", 100L, 9.0)))
    assert(files("site=b") == bBefore,
      "untouched partition must keep the exact same files (COW scope)")
  }

  test("mergeInto is idempotent: replaying the same batch changes nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_idem").toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0)), "site", "id", "v"),
      dir.getAbsolutePath, keys = Seq("site"))
    val updates = df(Seq(("a", 1L, 5.0, false), ("a", 2L, 0.0, true)),
      "site", "id", "v", "__delete")
    MergeData.mergeInto(spark, dir.getAbsolutePath, updates,
      Seq("site"), Seq("site", "id"))
    val once = state(dir.getAbsolutePath)
    MergeData.mergeInto(spark, dir.getAbsolutePath, updates,
      Seq("site"), Seq("site", "id"))
    assert(state(dir.getAbsolutePath) == once && once == Set(("a", 1L, 5.0)))
  }

  test("change feed resolves actions against the pre-merge base") {
    val root = java.nio.file.Files.createTempDirectory("graft_merge_cdf").toFile
    root.deleteOnExit()
    val lake = new java.io.File(root, "lake").getAbsolutePath
    val feed = new java.io.File(root, "feed").getAbsolutePath
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0)), "site", "id", "v"),
      lake, keys = Seq("site"))
    val updates = df(Seq(
      ("a", 1L, 100.0, false),  // matched → update
      ("a", 2L, 0.0, true),     // matched → delete
      ("a", 3L, 3.0, false),    // unmatched → insert
      ("a", 99L, 0.0, true)),   // delete of absent key → NO feed row
      "site", "id", "v", "__delete")
    MergeData.mergeInto(spark, lake, updates, Seq("site"), Seq("site", "id"),
      changeFeed = Some((feed, 7L)))
    val rows = spark.read.parquet(feed)
      .select("batch_id", "id", "_action", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    // Delta-CDF shape: preimages/deletes carry the OLD row's values
    assert(rows == Set(
      (7, 1L, "update_preimage", 1.0), (7, 1L, "update_postimage", 100.0),
      (7, 2L, "delete", 2.0), (7, 3L, "insert", 3.0)))
    // replaying the batch under the same batch_id KEEPS the original
    // increment verbatim (write-once): re-resolving against the now-
    // merged base would publish zero-deltas and bogus self-updates —
    // the exact failure a crash-restarted streaming merge would hit
    MergeData.mergeInto(spark, lake, updates, Seq("site"), Seq("site", "id"),
      changeFeed = Some((feed, 7L)))
    val replay = spark.read.parquet(feed)
      .select("batch_id", "id", "_action", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSet
    assert(replay == rows, "replay must preserve the original feed increment")
  }

  test("feed deltas maintain a grouped aggregate without rescanning the lake") {
    val root = java.nio.file.Files.createTempDirectory("graft_merge_ivm").toFile
    root.deleteOnExit()
    val lake = new java.io.File(root, "lake").getAbsolutePath
    val feed = new java.io.File(root, "feed").getAbsolutePath
    val base = df(Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("b", 10L, 10.0)),
      "site", "id", "v")
    MergeData.writeMerged(spark, base, lake, keys = Seq("site"))
    // the view BEFORE the merge
    val before = base.groupBy("site")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
    MergeData.mergeInto(spark, lake,
      df(Seq(("a", 1L, 100.0, false), ("a", 2L, 0.0, true),
        ("a", 4L, 4.0, false), ("b", 10L, 0.0, true)),
        "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"), changeFeed = Some((feed, 0L)))
    // maintained = before + deltas; truth = recompute from the lake
    val deltas = MergeData.feedDeltas(
      spark.read.parquet(feed), Seq("site"), "v")
    val maintained = before.join(deltas, Seq("site"), "full")
      .select(col("site"),
        (coalesce(col("s"), lit(0.0)) + coalesce(col("delta_sum"), lit(0.0))).as("s"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("delta_count"), lit(0L))).as("n"))
      .filter(col("n") > 0)
    val truth = spark.read.parquet(lake).groupBy("site")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
    assert(rowsOf(maintained.orderBy("site")) == rowsOf(truth.orderBy("site")))
    assert(rowsOf(maintained.orderBy("site")) ==
      Seq(Seq("a", 107.0, 3L))) // {1->100, 3->3, 4->4}; b emptied by the delete
  }

  test("replica converges to primary by replaying the change feed") {
    val root = java.nio.file.Files.createTempDirectory("graft_merge_repl").toFile
    root.deleteOnExit()
    val primary = new java.io.File(root, "primary").getAbsolutePath
    val replica = new java.io.File(root, "replica").getAbsolutePath
    val feed = new java.io.File(root, "feed").getAbsolutePath
    val base = df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0)),
      "site", "id", "v")
    MergeData.writeMerged(spark, base, primary, keys = Seq("site"))
    MergeData.writeMerged(spark, base, replica, keys = Seq("site"))

    // two primary merge batches, feed enabled
    MergeData.mergeInto(spark, primary,
      df(Seq(("a", 1L, 100.0, false), ("a", 2L, 0.0, true), ("c", 7L, 7.0, false)),
        "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"), changeFeed = Some((feed, 0L)))
    MergeData.mergeInto(spark, primary,
      df(Seq(("c", 7L, 70.0, false), ("b", 10L, 0.0, true)),
        "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"), changeFeed = Some((feed, 1L)))

    // bounded catch-up (point-in-time restore): untilBatch = 0 stops
    // at batch 0's state...
    MergeData.applyChangeFeed(spark, feed, replica, Seq("site"), Seq("site", "id"),
      untilBatch = 0L)
    assert(state(replica) == Set(
      ("a", 1L, 100.0), ("b", 10L, 10.0), ("c", 7L, 7.0)))
    // ...then the high-water mark applies only what's above it
    MergeData.applyChangeFeed(spark, feed, replica, Seq("site"), Seq("site", "id"),
      sinceBatch = 0L)
    assert(state(replica) == state(primary))
    assert(state(replica) == Set(("a", 1L, 100.0), ("c", 7L, 70.0)))
    // replaying from batch 1 again is idempotent (keys already final)
    MergeData.applyChangeFeed(spark, feed, replica, Seq("site"), Seq("site", "id"),
      sinceBatch = 0L)
    assert(state(replica) == state(primary))
  }

  test("a null __delete marker is an upsert, never a silent delete") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_nulldel").toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0)), "site", "id", "v"),
      dir.getAbsolutePath, keys = Seq("site"))
    // __delete arrives null (CSV empty field / outer-join product):
    // the key must be REPLACED, not dropped with no replacement
    val updates = df(Seq(
      ("a", 1L, 5.0, None: Option[Boolean]),
      ("a", 2L, 0.0, Some(true))),
      "site", "id", "v", "__delete")
    MergeData.mergeInto(spark, dir.getAbsolutePath, updates,
      Seq("site"), Seq("site", "id"))
    assert(state(dir.getAbsolutePath) == Set(("a", 1L, 5.0)))
  }

  test("null partition values merge (null-safe match + Hive default dir)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_nullpart").toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq((null.asInstanceOf[String], 1L, 1.0), ("a", 2L, 2.0)),
        "site", "id", "v"),
      dir.getAbsolutePath, keys = Seq("site"))
    // update the row in the null partition — must match the base row
    // (col === null never would) and swap __HIVE_DEFAULT_PARTITION__
    MergeData.mergeInto(spark, dir.getAbsolutePath,
      df(Seq((null.asInstanceOf[String], 1L, 9.0, false)),
        "site", "id", "v", "__delete"),
      Seq("site"), Seq("id"))
    assert(state(dir.getAbsolutePath) == Set((null, 1L, 9.0), ("a", 2L, 2.0)))
  }

  test("schema evolution: a batch adding a column null-fills old rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_evo").toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0)),
        "site", "id", "v"),
      dir.getAbsolutePath, keys = Seq("site"))
    // the batch carries a NEW column `src`
    MergeData.mergeInto(spark, dir.getAbsolutePath,
      df(Seq(("a", 1L, 100.0, "cdc", false), ("a", 3L, 3.0, "cdc", false)),
        "site", "id", "v", "src", "__delete"),
      Seq("site"), Seq("site", "id"))
    val got = spark.read.option("mergeSchema", "true")
      .parquet(dir.getAbsolutePath)
      .select("site", "id", "v", "src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        Option(r.getString(3)))).toSet
    assert(got == Set(
      ("a", 1L, 100.0, Some("cdc")), // updated row carries the new col
      ("a", 2L, 2.0, None),          // survivor null-fills
      ("a", 3L, 3.0, Some("cdc")),   // insert carries it
      ("b", 10L, 10.0, None)))       // untouched partition: old schema, null on read
    // a second evolved batch against the evolved lake still works
    MergeData.mergeInto(spark, dir.getAbsolutePath,
      df(Seq(("a", 2L, 20.0, "fix", false)),
        "site", "id", "v", "src", "__delete"),
      Seq("site"), Seq("site", "id"))
    val v2 = spark.read.option("mergeSchema", "true")
      .parquet(dir.getAbsolutePath)
      .filter(col("id") === 2L).select("v", "src").collect()
    assert(v2.length == 1 && v2(0).getDouble(0) == 20.0 && v2(0).getString(1) == "fix")
  }

  test("a batch missing a base data column is rejected, not null-merged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_drop").toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0)), "site", "id", "v"),
      dir.getAbsolutePath, keys = Seq("site"))
    val e = intercept[IllegalArgumentException] {
      MergeData.mergeInto(spark, dir.getAbsolutePath,
        df(Seq(("a", 1L, false)), "site", "id", "__delete"), // no `v`
        Seq("site"), Seq("site", "id"))
    }
    assert(e.getMessage.contains("missing base columns"))
    // and the lake is untouched
    assert(state(dir.getAbsolutePath) == Set(("a", 1L, 1.0), ("a", 2L, 2.0)))
  }

  test("a delete-everything batch empties the partition but not the lake") {
    val dir = java.nio.file.Files.createTempDirectory("graft_merge_del").toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("b", 2L, 2.0)), "site", "id", "v"),
      dir.getAbsolutePath, keys = Seq("site"))
    MergeData.mergeInto(spark, dir.getAbsolutePath,
      df(Seq(("a", 1L, 0.0, true)), "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"))
    assert(state(dir.getAbsolutePath) == Set(("b", 2L, 2.0)))
  }
}
