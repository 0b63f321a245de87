package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.MergeData

/** [[CopyInto]] — idempotent bulk file ingestion: file-level skip via
  * the intent ledger, exactly-once commits via the txn rail, and the
  * crash windows of the two-rail protocol resolved deterministically
  * (see CopyInto's protocol note). */
class CopyIntoSpec extends SparkSpec {

  private def freshTarget(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_copy").toFile
    root.deleteOnExit()
    val lake = new java.io.File(root, "lake").getAbsolutePath
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0)), "site", "id", "v"), lake, keys = Seq("site"))
    Versioned.init(spark, lake, commitTs = 1000L)
    lake
  }

  private def dropFiles(n: Int, tag: String): String = {
    val src = java.nio.file.Files.createTempDirectory(s"graft_drop_$tag")
      .toFile.getAbsolutePath
    (1 to n).foreach { i =>
      df(Seq(("b", 100L + i, i.toDouble)), "site", "id", "v")
        .coalesce(1).write.parquet(s"$src/upload_$i")
    }
    src
  }

  private def state(dir: String): Set[(String, Long, Double)] =
    Versioned.snapshot(spark, dir).select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("COPY INTO loads fresh files once: second run skips everything, a new drop loads only itself") {
    val lake = freshTarget()
    val src = dropFiles(3, "basic")
    val r1 = CopyInto.run(spark, lake, src, "parquet")
    assert(r1.filesLoaded == 3L && r1.filesSkipped == 0L)
    assert(state(lake) == Set(("a", 1L, 1.0), ("b", 101L, 1.0),
      ("b", 102L, 2.0), ("b", 103L, 3.0)))
    // idempotent re-run: nothing loads, nothing commits
    val v1 = Versioned.currentVersion(spark, lake)
    val r2 = CopyInto.run(spark, lake, src, "parquet")
    assert(r2.filesLoaded == 0L && r2.filesSkipped == 3L)
    assert(Versioned.currentVersion(spark, lake) == v1)
    // a NEW drop under the same root loads only the new file
    df(Seq(("c", 200L, 9.0)), "site", "id", "v")
      .coalesce(1).write.parquet(s"$src/upload_4")
    val r3 = CopyInto.run(spark, lake, src, "parquet")
    assert(r3.filesLoaded == 1L && r3.filesSkipped == 3L)
    assert(state(lake).contains(("c", 200L, 9.0)))
    assert(state(lake).size == 5)
  }

  test("PATTERN filters by file-name glob; csv.gz reads under the table schema (the reference's upload-drop shape); force reloads") {
    val lake = freshTarget()
    val src = java.nio.file.Files.createTempDirectory("graft_drop_csv")
      .toFile.getAbsolutePath
    df(Seq(("b", 10L, 1.5)), "site", "id", "v").coalesce(1)
      .write.option("header", "true")
      .option("compression", "gzip").csv(s"$src/d1")
    df(Seq(("b", 11L, 2.5)), "site", "id", "v").coalesce(1)
      .write.option("header", "true")
      .option("compression", "gzip").csv(s"$src/d2")
    // a decoy the pattern must exclude
    df(Seq(("z", 99L, 9.9)), "site", "id", "v").coalesce(1)
      .write.json(s"$src/decoy")
    val r = CopyInto.run(spark, lake, src, "csv",
      pattern = Some("*.csv.gz"), options = Map("header" -> "true"))
    assert(r.filesLoaded == 2L)
    assert(state(lake) == Set(("a", 1L, 1.0), ("b", 10L, 1.5),
      ("b", 11L, 2.5)))
    // force: the same files load again (ledger still names them once
    // semantically — it is a set union)
    val rf = CopyInto.run(spark, lake, src, "csv",
      pattern = Some("*.csv.gz"), options = Map("header" -> "true"),
      force = true)
    assert(rf.filesLoaded == 2L)
    assert(Versioned.snapshot(spark, lake)
      .filter(col("id") === 10L).count() == 2L)
  }

  test("crash windows: a committed-but-unrecorded batch is impossible (intent precedes commit); intent-without-commit recovers exactly; a torn intent is dropped") {
    val lake = freshTarget()
    val src = dropFiles(2, "crash")
    // simulate: intent written, commit lost (crash between rails)
    val fs = new Path(lake).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(src)).flatMap(d =>
      fs.listStatus(d.getPath)).map(_.getPath.toUri.getPath)
      .filter(p => p.endsWith(".parquet") && !new Path(p).getName
        .startsWith("_")).toSeq
    val ledger = new Path(lake, "_manifest/copyinto")
    fs.mkdirs(ledger)
    val out = fs.create(new Path(ledger, "seq000000.list"), false)
    out.write((files.sorted :+ "#end").mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    out.close()
    // recovery replays EXACTLY the intent, then the fresh scan finds
    // nothing new — one commit total, no duplicates
    val r = CopyInto.run(spark, lake, src, "parquet")
    assert(r.filesLoaded == 0L && r.filesSkipped == 2L,
      s"recovery must consume the intent, then skip (got $r)")
    assert(state(lake) == Set(("a", 1L, 1.0), ("b", 101L, 1.0),
      ("b", 102L, 2.0)))
    assert(Versioned.lastTxn(spark, lake, "copyinto") == 0L)
    // torn intent (no #end), uncommitted: dropped, batch proceeds fresh
    val out2 = fs.create(new Path(ledger, "seq000001.list"), false)
    out2.write("/nonexistent/file.parquet\n".getBytes("UTF-8"))
    out2.close()
    df(Seq(("d", 300L, 3.0)), "site", "id", "v")
      .coalesce(1).write.parquet(s"$src/upload_3")
    val r2 = CopyInto.run(spark, lake, src, "parquet")
    assert(r2.filesLoaded == 1L && r2.filesSkipped == 2L)
    assert(state(lake).contains(("d", 300L, 3.0)))
  }

  test("graft_copy_ledger TVF: one row per (seq, file) with commit status; uncommitted intents report false") {
    graft.GraftExtensions.register(spark)
    val lake = freshTarget()
    val src = dropFiles(2, "ledger")
    CopyInto.run(spark, lake, src, "parquet")
    df(Seq(("e", 400L, 4.0)), "site", "id", "v")
      .coalesce(1).write.parquet(s"$src/upload_3")
    CopyInto.run(spark, lake, src, "parquet")
    val rows = spark.sql(s"SELECT * FROM graft_copy_ledger('$lake')")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(rows.length == 3, s"3 loaded files expected (got ${rows.toSeq})")
    assert(rows.count(_._1 == 0L) == 2 && rows.count(_._1 == 1L) == 1)
    assert(rows.forall(_._3), "both batches committed")
    // a hand-planted uncommitted intent reports committed=false
    val fs = new Path(lake).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(lake, "_manifest/copyinto/seq000002.list"),
      false)
    out.write("/pending/file.parquet\n#end\n".getBytes("UTF-8"))
    out.close()
    val pend = spark.sql(s"SELECT * FROM graft_copy_ledger('$lake') " +
      "WHERE NOT committed").collect()
    assert(pend.length == 1 && pend.head.getString(1) == "/pending/file.parquet")
  }

  test("schema discipline: extra/missing source columns refuse with the diff; casts align matching columns; non-table target refuses") {
    val lake = freshTarget()
    val src = java.nio.file.Files.createTempDirectory("graft_drop_schema")
      .toFile.getAbsolutePath
    df(Seq(("b", 5L, 5.0, "extra")), "site", "id", "v", "junk")
      .coalesce(1).write.parquet(s"$src/bad")
    val e = intercept[IllegalArgumentException] {
      CopyInto.run(spark, lake, src, "parquet") }
    assert(e.getMessage.contains("junk"), e.getMessage)
    // int id casts up to the table's long; column order is free
    val src2 = java.nio.file.Files.createTempDirectory("graft_drop_cast")
      .toFile.getAbsolutePath
    df(Seq((7, 7.5, "b")), "id", "v", "site")
      .coalesce(1).write.parquet(s"$src2/ok")
    val r = CopyInto.run(spark, lake, src2, "parquet")
    assert(r.filesLoaded == 1L)
    assert(state(lake).contains(("b", 7L, 7.5)))
    val e2 = intercept[IllegalArgumentException] {
      CopyInto.run(spark, "/tmp/graft_not_a_table", src2, "parquet") }
    assert(e2.getMessage.contains("not a graft table"), e2.getMessage)
  }
}
