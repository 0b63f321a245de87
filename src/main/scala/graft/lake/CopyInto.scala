package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** `COPY INTO` — idempotent bulk file ingestion into a versioned lake
  * (Delta's verb for "load whatever landed since last time"). The
  * reference's entire ingest loop is this operation: per-upload
  * `.csv.gz` drops merged into parquet tables, re-runnable without
  * double-loading (MHM-data-pipelines merge_data.py:84-118 tracks
  * processed uploads by listing what the merged output already holds;
  * COPY INTO is the same contract with an explicit ledger).
  *
  * EXACTLY-ONCE, per FILE, across crashes — the two-rail protocol:
  *
  *  1. an INTENT ledger entry under `_manifest/copyinto/` names the
  *     source files this batch will load (one text file per batch,
  *     sequential `seq%06d.list`, created exclusively — never
  *     overwritten, terminated by an `#end` marker so a torn write is
  *     detectable);
  *  2. the data commit is a [[Versioned.append]] carrying the
  *     `(copyinto:<target-scoped id>, seq)` transaction marker — the
  *     SAME high-water rail the streaming sink rides, so a replayed
  *     seq is a no-op commit.
  *
  * Every crash window resolves deterministically on the next run:
  *  - crash BEFORE the intent entry: nothing happened, files reload;
  *  - crash AFTER intent, BEFORE commit (`lastTxn < seq`): RECOVERY —
  *    re-read exactly the intent's file list and commit it under the
  *    same seq (new files that landed meanwhile wait for the next
  *    batch, by design: the intent is the unit of atomicity);
  *  - torn intent entry (no `#end`), uncommitted: delete it and
  *    proceed fresh — the commit for it can never exist;
  *  - crash AFTER commit: the txn high-water marks seq committed, the
  *    intent entry already names its files — both rails agree.
  *
  * Batch validation (schema alignment) runs BEFORE the intent is
  * recorded, so a misaligned source fails with nothing written. A
  * recovery batch that still fails (source files deleted since, a
  * constraint added meanwhile) blocks COPY loudly until the cause is
  * fixed or the intent entry is removed — removing an UNCOMMITTED
  * intent is always safe: its commit never happened.
  *
  * At 100 TB shape: the ledger costs one tiny FS object per COPY
  * batch (not per file — a batch names thousands of files in one
  * entry), the skip set resolves from `O(batches)` small reads, and
  * the data cost is a scan of exactly the FRESH files. Nothing here
  * scales with lake size or history depth.
  */
object CopyInto {

  final case class Result(version: Long, filesLoaded: Long,
      filesSkipped: Long)

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def ledgerRoot(dir: String) = new Path(dir, "_manifest/copyinto")

  private def entryPath(dir: String, seq: Long) =
    new Path(ledgerRoot(dir), f"seq$seq%06d.list")

  /** The target-scoped transaction id: COPY batches into the same
    * table share one sequential rail whatever their source — the seq
    * is the batch identity, the named files are the payload. */
  private def txnId(dir: String): String = "copyinto"

  private def listEntries(fs: FileSystem, dir: String): Seq[Long] = {
    val root = ledgerRoot(dir)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).map(_.getPath.getName).toSeq.collect {
      case n if n.matches("seq\\d+\\.list") =>
        n.stripPrefix("seq").stripSuffix(".list").toLong
    }.sorted
  }

  /** Reads an intent entry; None when the entry is torn (no `#end`
    * terminator — the writer died mid-entry). */
  private def readEntry(fs: FileSystem, dir: String,
      seq: Long): Option[Seq[String]] = {
    val in = fs.open(entryPath(dir, seq))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    if (lines.lastOption.contains("#end")) Some(lines.dropRight(1))
    else None
  }

  /** Create-exclusive intent write: refuses if the seq exists (a
    * concurrent COPY took it — caller recomputes against the winner's
    * ledger). The `#end` terminator makes torn writes detectable. */
  private def writeEntry(fs: FileSystem, dir: String, seq: Long,
      files: Seq[String]): Unit = {
    fs.mkdirs(ledgerRoot(dir))
    val out = fs.create(entryPath(dir, seq), false)
    try {
      val body = (files.sorted :+ "#end").mkString("", "\n", "\n")
      out.write(body.getBytes("UTF-8"))
    } finally out.close()
  }

  /** Files already loaded (union of every COMMITTED or intended
    * entry — an uncommitted intent is either recovered first or torn
    * and deleted, so by the time the skip set is consulted every
    * entry counts). */
  private def loadedFiles(fs: FileSystem, dir: String): Set[String] =
    listEntries(fs, dir).flatMap(s => readEntry(fs, dir, s)
      .getOrElse(Seq.empty)).toSet

  /** Lists source files under `from` matching `pattern` (a glob over
    * the file NAME tail when relative, or the full path when it
    * contains `/`). Directories recurse; hidden/underscore files and
    * anything under a `_`/`.` directory are skipped (Spark's own data
    * source convention). */
  private def listSource(fs: FileSystem, from: String,
      pattern: Option[String]): Seq[String] = {
    val root = new Path(from)
    require(fs.exists(root), s"COPY INTO source does not exist: $from")
    val buf = Vector.newBuilder[String]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) {
        if (st.isDirectory) walk(st.getPath)
        else buf += st.getPath.toUri.getPath
      }
    }
    if (fs.getFileStatus(root).isDirectory) walk(root)
    else buf += root.toUri.getPath
    val all = buf.result()
    pattern match {
      case None => all
      case Some(g) =>
        val rx = ("^" + g.flatMap {
          case '*' => "[^/]*"
          case '?' => "[^/]"
          case c => java.util.regex.Pattern.quote(c.toString)
        } + "$").r
        if (g.contains('/')) all.filter(p => rx.findFirstIn(p).isDefined)
        else all.filter(p =>
          rx.findFirstIn(new Path(p).getName).isDefined)
    }
  }

  /** Reads `files` as `format` self-described, then aligns the batch
    * to the table's logical schema BY NAME: same column SET required
    * (extra/missing columns refuse with the diff — COPY never evolves
    * schema), then a cast into the table's order and types. Matching
    * by name, never position, is the safety property: the table's
    * column order (partition columns last) need not match the file's.
    * CSV therefore needs its `header` option (headerless files
    * surface `_c0`-named columns and refuse with the diff). */
  private def readAligned(spark: SparkSession, dir: String,
      files: Seq[String], format: String,
      options: Map[String, String]): DataFrame = {
    val table = Versioned.snapshot(spark, dir).schema
    val reader = spark.read.options(options)
    val raw = format.toLowerCase match {
      case "parquet" => reader.parquet(files: _*)
      case "csv" => reader.csv(files: _*)
      case "json" => reader.json(files: _*)
      case other => throw new IllegalArgumentException(
        s"unsupported COPY INTO FILEFORMAT '$other': PARQUET, CSV and " +
          "JSON are supported")
    }
    val got = raw.columns.map(_.toLowerCase).toSet
    val want = table.fieldNames.map(_.toLowerCase).toSet
    require(got == want,
      s"COPY INTO batch schema does not match the table: missing " +
        s"${(want -- got).toSeq.sorted.mkString("[", ",", "]")}, extra " +
        s"${(got -- want).toSeq.sorted.mkString("[", ",", "]")} — COPY " +
        "never evolves schema (ALTER TABLE ... ADD COLUMN first)")
    raw.select(table.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  /** The COPY ledger as rows — one per (batch seq, source file) with
    * the batch's commit status from the txn rail (`committed=false`
    * marks an intent whose commit is pending recovery). Torn entries
    * are omitted (pre-drop debris, cleaned by the next run). The
    * observability read for the ingest loop: which uploads landed,
    * which batch brought them. */
  def ledger(spark: SparkSession, dir: String): Seq[(Long, String, Boolean)] = {
    val fs = fsOf(spark, dir)
    val hw = Versioned.lastTxn(spark, dir, txnId(dir))
    listEntries(fs, dir).flatMap { seq =>
      readEntry(fs, dir, seq).getOrElse(Seq.empty)
        .map(f => (seq, f, hw >= seq))
    }
  }

  /** Run one COPY INTO batch. `force` reloads matching files even if
    * the ledger names them (the entry still records them — the ledger
    * is a set union, duplicates are harmless). */
  def run(spark: SparkSession, dir: String, from: String, format: String,
      pattern: Option[String] = None,
      options: Map[String, String] = Map.empty,
      force: Boolean = false): Result = {
    require(Versioned.currentVersion(spark, dir) >= 0,
      s"COPY INTO target is not a graft table: $dir — CREATE TABLE (or " +
        "Versioned.init) first")
    val fs = fsOf(spark, dir)
    val keys = Versioned.layoutPartitionKeys(spark, dir)
    val tid = txnId(dir)

    // ---- recovery/cleanup of the newest intent entry ----------------
    listEntries(fs, dir).lastOption.foreach { last =>
      if (Versioned.lastTxn(spark, dir, tid) < last) {
        readEntry(fs, dir, last) match {
          case Some(intended) =>
            // intent written, commit lost: replay EXACTLY this batch
            val batch = readAligned(spark, dir, intended, format, options)
            Versioned.append(spark, dir, batch, keys,
              txn = Some((tid, last)))
          case None =>
            // torn intent, no commit can reference it: drop and proceed
            fs.delete(entryPath(dir, last), false)
        }
      } else if (readEntry(fs, dir, last).isEmpty) {
        // committed but torn should be impossible (the commit only runs
        // after a terminated entry) — refuse rather than double-load
        throw new IllegalStateException(
          s"COPY INTO ledger entry $last of $dir is torn but its commit " +
            "exists: the ledger cannot say what was loaded — repair the " +
            "entry from the commit's files before copying again")
      }
    }

    // ---- the new batch ----------------------------------------------
    val listed = listSource(fs, from, pattern)
    val loaded = loadedFiles(fs, dir)
    val fresh = if (force) listed else listed.filterNot(loaded.contains)
    if (fresh.isEmpty)
      return Result(Versioned.currentVersion(spark, dir), 0L,
        listed.size.toLong)
    // validate the batch BEFORE recording intent: a misaligned source
    // must fail with nothing written, not wedge recovery on a batch
    // that can never load (alignment checks run at construction)
    val batch = readAligned(spark, dir, fresh, format, options)
    val seq = listEntries(fs, dir).lastOption.getOrElse(-1L) + 1L
    writeEntry(fs, dir, seq, fresh) // create-exclusive: concurrent COPY loses here
    val v = Versioned.append(spark, dir, batch, keys, txn = Some((tid, seq)))
    Result(v, fresh.size.toLong, (listed.size - fresh.size).toLong)
  }
}
