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

  test("ledger checkpoint: committed entries fold into loaded.set — skip set identical across the fold, seq allocation continues, per-batch attribution survives") {
    val lake = freshTarget()
    val src = java.nio.file.Files.createTempDirectory("graft_drop_ckpt")
      .toFile.getAbsolutePath
    val n = CopyInto.CompactAfter + 3 // enough batches to trigger a fold
    (1 to n).foreach { i =>
      df(Seq(("b", 100L + i, i.toDouble)), "site", "id", "v")
        .coalesce(1).write.parquet(s"$src/upload_$i")
      val r = CopyInto.run(spark, lake, src, "parquet")
      assert(r.filesLoaded == 1L, s"batch $i must load exactly its file")
    }
    val fs = new Path(lake).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ledgerDir = new Path(lake, "_manifest/copyinto")
    def names() = fs.listStatus(ledgerDir).map(_.getPath.getName).toSeq
    assert(names().exists(_.matches("loaded\\d+\\.set")),
      s"a checkpoint must exist after $n batches (got ${names()})")
    val tail = names().count(_.matches("seq\\d+\\.list"))
    assert(tail <= CopyInto.CompactAfter,
      s"folded entries must be deleted (tail=$tail)")
    // the skip set is IDENTICAL across the fold: nothing reloads
    val v = Versioned.currentVersion(spark, lake)
    val r = CopyInto.run(spark, lake, src, "parquet")
    assert(r.filesLoaded == 0L && r.filesSkipped == n.toLong, s"got $r")
    assert(Versioned.currentVersion(spark, lake) == v)
    // seq allocation continues PAST the checkpoint (never reuses a
    // folded seq — the txn rail would silently skip the commit)
    df(Seq(("f", 900L, 9.0)), "site", "id", "v")
      .coalesce(1).write.parquet(s"$src/upload_extra")
    val r2 = CopyInto.run(spark, lake, src, "parquet")
    assert(r2.filesLoaded == 1L)
    assert(Versioned.lastTxn(spark, lake, "copyinto") == n.toLong,
      "seq must continue from the checkpointed high-water")
    // per-batch attribution survives the fold: one ledger row per
    // (seq, file), all committed, covering every batch
    val rows = CopyInto.ledger(spark, lake)
    assert(rows.size == n + 1 && rows.forall(_._3),
      s"ledger must stay whole across the fold (got ${rows.size})")
    assert(rows.map(_._1).distinct.size == n + 1)
  }

  test("checkpoint crash windows: entries surviving next to the checkpoint that absorbed them are a harmless union; a torn checkpoint is ignored") {
    val lake = freshTarget()
    val src = dropFiles(2, "ckptcrash")
    CopyInto.run(spark, lake, src, "parquet")
    CopyInto.run(spark, lake, src, "parquet") // no-op, nothing new
    val fs = new Path(lake).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val ledgerDir = new Path(lake, "_manifest/copyinto")
    // simulate a fold that crashed between checkpoint write and entry
    // delete: plant the checkpoint, LEAVE the entries
    val entry = CopyInto.ledger(spark, lake)
    val out = fs.create(new Path(ledgerDir, "loaded000000.set"), false)
    out.write((entry.map { case (s, f, _) => s"$s\t$f" } :+ "#end")
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    out.close()
    val r = CopyInto.run(spark, lake, src, "parquet")
    assert(r.filesLoaded == 0L && r.filesSkipped == 2L,
      s"checkpoint+entry overlap must stay a no-op union (got $r)")
    // a TORN checkpoint (no #end) is ignored — the entries still cover
    fs.delete(new Path(ledgerDir, "loaded000000.set"), false)
    val out2 = fs.create(new Path(ledgerDir, "loaded000000.set"), true)
    out2.write("0\t/lost/row.parquet\n".getBytes("UTF-8")) // no #end
    out2.close()
    val r2 = CopyInto.run(spark, lake, src, "parquet")
    assert(r2.filesLoaded == 0L && r2.filesSkipped == 2L,
      s"a torn checkpoint must not hide (or invent) loaded files (got $r2)")
  }

  test("recovery replays under the intent's RECORDED format/options, not the recovering invocation's") {
    val lake = freshTarget()
    val src = java.nio.file.Files.createTempDirectory("graft_drop_recipe")
      .toFile.getAbsolutePath
    df(Seq(("b", 77L, 7.5)), "site", "id", "v").coalesce(1)
      .write.option("header", "true").csv(s"$src/d1")
    // crash window: a CSV batch's intent is on disk, its commit lost
    val e1 = intercept[Exception] { // writes the intent, then we fake the crash
      CopyInto.haltBeforeCommit = true
      try CopyInto.run(spark, lake, src, "csv",
        options = Map("header" -> "true"))
      finally CopyInto.haltBeforeCommit = false
    }
    assert(e1.getMessage.contains("halt"), e1.getMessage)
    assert(Versioned.lastTxn(spark, lake, "copyinto") == -1L)
    // the recovering COPY is issued as PARQUET — the intent's recorded
    // csv+header recipe must win, or the replay misparses the bytes
    val r = CopyInto.run(spark, lake, src, "parquet")
    assert(r.filesLoaded == 0L, s"recovery consumed the intent (got $r)")
    assert(state(lake) == Set(("a", 1L, 1.0), ("b", 77L, 7.5)),
      "the crashed CSV batch must replay as CSV with its header option")
  }

  test("an EMPTY FORMAT_OPTIONS value round-trips through the intent recipe (the r15 review crash: b64('') is one token)") {
    val lake = freshTarget()
    val src = java.nio.file.Files.createTempDirectory("graft_drop_emptyopt")
      .toFile.getAbsolutePath
    df(Seq(("b", 55L, 5.5)), "site", "id", "v").coalesce(1)
      .write.option("header", "true").csv(s"$src/d1")
    val r = CopyInto.run(spark, lake, src, "csv",
      options = Map("header" -> "true", "nullValue" -> ""))
    assert(r.filesLoaded == 1L)
    // the re-run must PARSE the recorded recipe (readEntry crashed on
    // the empty-value #option line before the fix) and skip everything
    val r2 = CopyInto.run(spark, lake, src, "csv",
      options = Map("header" -> "true", "nullValue" -> ""))
    assert(r2.filesLoaded == 0L && r2.filesSkipped == 1L, s"got $r2")
    assert(CopyInto.ledger(spark, lake).nonEmpty)
  }

  test("ledger entries store fully-qualified URIs (cross-filesystem sources); legacy scheme-stripped entries still skip") {
    val lake = freshTarget()
    val src = dropFiles(1, "uri")
    CopyInto.run(spark, lake, src, "parquet")
    val rows = CopyInto.ledger(spark, lake)
    assert(rows.nonEmpty && rows.forall(_._2.startsWith("file:")),
      s"ledger paths must be fully qualified (got ${rows.map(_._2)})")
    // a LEGACY entry naming the same file scheme-stripped still skips
    val lake2 = freshTarget()
    val fs = new Path(lake2).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(lake2, "_manifest/copyinto"))
    val stripped = rows.map(r => new Path(r._2).toUri.getPath)
    val out = fs.create(new Path(lake2, "_manifest/copyinto/seq000000.list"),
      false)
    out.write((stripped.sorted :+ "#end").mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    out.close()
    // mark seq 0 committed on the txn rail so recovery doesn't replay
    Versioned.append(spark, lake2,
      df(Seq(("x", 1L, 1.0)), "site", "id", "v"), Seq("site"),
      txn = Some(("copyinto", 0L)))
    val r = CopyInto.run(spark, lake2, src, "parquet")
    assert(r.filesLoaded == 0L && r.filesSkipped == 1L,
      s"legacy scheme-stripped ledger paths must still skip (got $r)")
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

  test("a fold that loses an entry mid-read ABORTS (no checkpoint written, no skip-set loss) and the COPY that triggered it still reports success — ledger maintenance is best-effort post-commit") {
    val lake = freshTarget()
    val src = java.nio.file.Files.createTempDirectory("graft_drop_race")
      .toFile.getAbsolutePath
    val fs = new Path(lake).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // exactly CompactAfter batches: the tail sits AT the threshold, so
    // the NEXT (trigger) batch is the one whose post-commit fold runs
    val n = CopyInto.CompactAfter
    (1 to n).foreach { i =>
      df(Seq(("b", 100L + i, i.toDouble)), "site", "id", "v")
        .coalesce(1).write.parquet(s"$src/upload_$i")
      assert(CopyInto.run(spark, lake, src, "parquet").filesLoaded == 1L)
    }
    // deterministic stand-in for "entry vanished between the listing
    // and its read" (a racing fold absorbed + deleted it): replace a
    // committed entry with a nonempty DIRECTORY of the same name —
    // listed by name, FileNotFoundException on open. Its source upload
    // goes too, so the skip-set gap cannot re-list the file as fresh.
    val seqs = fs.listStatus(CopyInto.ledgerRoot(lake))
      .map(_.getPath.getName).filter(_.matches("seq\\d+\\.list"))
      .map(_.stripPrefix("seq").stripSuffix(".list").toLong).sorted
    val victim = CopyInto.entryPath(lake, seqs.head)
    fs.delete(victim, false)
    fs.mkdirs(new Path(victim, "child"))
    fs.delete(new Path(s"$src/upload_1"), true)
    def ledgerNames() = fs.listStatus(CopyInto.ledgerRoot(lake))
      .map(_.getPath.getName).toSeq
    val ckptsBefore = ledgerNames().filter(_.matches("loaded\\d+\\.set"))
    // this batch pushes the tail past CompactAfter: the fold runs, hits
    // the vanished entry, and must ABORT silently — the batch itself
    // (already committed) still reports success
    df(Seq(("b", 999L, 99.0)), "site", "id", "v")
      .coalesce(1).write.parquet(s"$src/upload_trigger")
    val r = CopyInto.run(spark, lake, src, "parquet")
    assert(r.filesLoaded == 1L,
      "the COPY batch must succeed even when post-commit compaction aborts")
    assert(state(lake).contains(("b", 999L, 99.0)))
    val ckptsAfter = ledgerNames().filter(_.matches("loaded\\d+\\.set"))
    assert(ckptsAfter == ckptsBefore,
      s"an aborted fold must write NO checkpoint (before=$ckptsBefore after=$ckptsAfter)")
    // and nothing re-loads: the committed entries still fence their files
    val r2 = CopyInto.run(spark, lake, src, "parquet")
    assert(r2.filesLoaded == 0L,
      "skip set must survive the aborted fold intact")
  }
}
