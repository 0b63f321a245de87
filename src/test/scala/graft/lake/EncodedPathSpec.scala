package graft.lake

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path}
import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.ops.MergeData

/** Path-representation parity across the three spellings a file path
  * takes inside the engine: the MANIFEST's raw string, the Hadoop
  * LISTING's qualified `Path`, and `input_file_name()`'s URL-ENCODED
  * URI. A table directory containing a space (or any URI-encodable
  * character) makes the three diverge — these tests pin that
  *
  *  1. a scoped-tombstone exemption still recognizes its own commit's
  *     fresh files (raw-vs-encoded mismatch silently DELETED a MOR
  *     merge's own upserts), and
  *  2. the format fast path still matches listed statuses against
  *     manifest refs when the table dir is scheme-qualified
  *     (raw-vs-qualified mismatch read an EMPTY table),
  *
  * plus the commit owner's lost-CAS classification on stores whose
  * `rename` refuses an existing destination (HDFS semantics). */
class EncodedPathSpec extends SparkSpec {

  private def state(d: DataFrame): Set[(String, Long, Double)] =
    d.select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private def freshLake(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0)),
        "site", "id", "v"),
      dir.getAbsolutePath, keys = Seq("site"))
    dir.getAbsolutePath
  }

  test("lake dir with a space: MOR merge's own fresh rows survive its scoped tombstone; chain + format read agree") {
    val dir = freshLake("graft enc ") // the space is the test
    assert(dir.contains(" "))
    Versioned.init(spark, dir)
    // update a@1, delete a@2, insert c@7 — all three land in FRESH
    // files whose input_file_name is URL-encoded (space -> %20); the
    // scoped tombstone's exempt set must still recognize them
    val v1 = Versioned.mergeIntoMor(spark, dir,
      df(Seq(("a", 1L, 100.0, false), ("a", 2L, 0.0, true),
        ("c", 7L, 7.0, false)), "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"))
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 100.0), ("b", 10L, 10.0), ("c", 7L, 7.0)),
      "the merge's own upserts must survive its scoped tombstone")
    // chain: second MOR merge on the same key — first merge's insert
    // is hidden (its file pre-dates the new bound), second's survives
    Versioned.mergeIntoMor(spark, dir,
      df(Seq(("a", 1L, 500.0, false)), "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"))
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 500.0), ("b", 10L, 10.0), ("c", 7L, 7.0)))
    // the format surface agrees in BOTH relation shapes: the MOR
    // snapshot path now, the vectorized fast path after materialize
    assert(state(spark.read.format("graft").load(dir)) ==
      state(Versioned.snapshot(spark, dir)))
    Versioned.materializeDeletes(spark, dir, Seq("site"))
    assert(state(spark.read.format("graft").load(dir)) ==
      Set(("a", 1L, 500.0), ("b", 10L, 10.0), ("c", 7L, 7.0)))
    // deleteWhere (global tombstone) on the spaced dir still reads right
    Versioned.deleteWhere(spark, dir, org.apache.spark.sql.functions
      .col("id") === 10L, Seq("site", "id"))
    assert(state(Versioned.snapshot(spark, dir)) ==
      Set(("a", 1L, 500.0), ("c", 7L, 7.0)))
  }

  test("scheme-qualified table dir: format fast path matches the listing (non-empty read, rows == snapshot)") {
    val dir = freshLake("graft_scheme")
    Versioned.init(spark, dir)
    val qualified = "file:" + dir
    val read = spark.read.format("graft").load(qualified)
    assert(read.count() == 3L, "qualified dir must not read empty")
    assert(state(read) == state(Versioned.snapshot(spark, dir)))
  }

  test("commit owner: a rename lost inside the exists->rename window classifies as `concurrent commit` (HDFS semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_caswin").toFile
    dir.deleteOnExit()
    val local = FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration).getRawFileSystem
    // models an HDFS-style store: rename REFUSES an existing dst, and
    // the destination "appears" between the owner's exists check and
    // its rename (the racing winner's commit)
    val dst = new Path(dir.getAbsolutePath, "_manifest_v000001")
    val alt = new Path(dir.getAbsolutePath, "_manifest_v000001.delta")
    val fs = new FilterFileSystem(local) {
      private var checks = 0
      override def getUri: URI = URI.create("mockhdfs:///")
      override def exists(p: Path): Boolean = {
        if (p == dst) { checks += 1; if (checks == 1) false else true }
        else super.exists(p)
      }
      override def rename(src: Path, d: Path): Boolean =
        if (exists(d)) false else super.rename(src, d)
    }
    val e = intercept[IllegalArgumentException] {
      Versioned.RenameCommitOwner.writeVersion(fs,
        dir.getAbsolutePath, 1L, dst, alt, Seq("meta line"))
    }
    assert(e.getMessage.contains("concurrent commit"),
      s"lost CAS must classify as retryable, got: ${e.getMessage}")
  }
}
