package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned (snapshot-isolated) lake: a minimal Delta/Iceberg-style
  * manifest layer over a Hive-partitioned parquet directory.
  *
  * The COW merge in [[graft.ops.MergeData.mergeInto]] commits by
  * partition-directory swap — correct and idempotent, but a reader
  * concurrent with the swap can observe a partition mid-replacement,
  * and history is gone the moment the swap lands. Table formats solve
  * both with a log: DATA FILES ARE IMMUTABLE, each commit appends new
  * files plus one manifest listing exactly the live files, and the
  * manifest write is the atomic commit point. This object is that
  * protocol, reduced to its load-bearing minimum:
  *
  *  - `_manifest/v<N>.txt` = newline-separated relative paths of every
  *    file live at version N (Delta's checkpoint, not its delta log —
  *    at manifest sizes of file-count lines, a full listing per commit
  *    is cheaper than log replay and needs no compaction machinery);
  *  - a commit writes data files FIRST (invisible to readers: nothing
  *    references them), then renames `v<N+1>.txt.tmp` into place —
  *    one metadata op, atomic on HDFS-like stores;
  *  - readers resolve a version (latest by default) and read exactly
  *    its file list; a reader holding version N is immune to any
  *    concurrent commit because commits never mutate or delete files
  *    (only [[vacuum]] deletes, and only files unreferenced by every
  *    retained version);
  *  - time travel = reading an older manifest.
  *
  * Scale shape: every driver-side operation is bounded by FILE COUNT
  * (the same scale as any file listing); data movement is bounded by
  * the merge batch's touched partitions, exactly like the swap-based
  * merge. Reference: Delta Lake's transaction protocol (public spec);
  * re-expressed from scratch on plain Hadoop FS + Spark reads.
  */
object Versioned {

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Long) =
    new Path(dir, f"_manifest/v$v%06d.txt")

  /** Latest committed version, or -1 if the lake is unversioned. */
  def currentVersion(spark: SparkSession, dir: String): Long = {
    val fs = fsOf(spark, dir)
    val md = new Path(dir, "_manifest")
    if (!fs.exists(md)) -1L
    else fs.listStatus(md).map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+\\.txt") =>
        n.stripPrefix("v").stripSuffix(".txt").toLong }
      .foldLeft(-1L)(math.max)
  }

  private def manifestLines(spark: SparkSession, dir: String, v: Long): Seq[String] = {
    val fs = fsOf(spark, dir)
    val p = manifestPath(dir, v)
    require(fs.exists(p), s"version $v does not exist in $dir")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Relative data-file paths live at `version` (latest if -1).
    * Lines starting with `#` are commit metadata (txn markers), not
    * files. */
  def filesAt(spark: SparkSession, dir: String, version: Long = -1L): Seq[String] = {
    val v = if (version >= 0) version else currentVersion(spark, dir)
    require(v >= 0, s"no manifest in $dir — call init() first")
    manifestLines(spark, dir, v).filterNot(_.startsWith("#"))
  }

  /** Highest batch id committed under `txnId`, or -1 — the Delta
    * `txn` action: an idempotent writer (a streaming sink) stamps each
    * commit with `(txnId, batchId)` and skips batches at or below the
    * recorded high-water mark on replay. Scans manifests newest-first
    * (driver-side, bounded by version count — the same scale as any
    * log replay); batch ids commit in order per txn, so the first hit
    * is the max. */
  def lastTxn(spark: SparkSession, dir: String, txnId: String): Long = {
    val cur = currentVersion(spark, dir)
    val prefix = s"#txn $txnId "
    (cur to 0L by -1L).iterator
      .flatMap(v => manifestLines(spark, dir, v).find(_.startsWith(prefix)))
      .map(_.stripPrefix(prefix).trim.toLong)
      .nextOption().getOrElse(-1L)
  }

  /** Recursive data-file listing (relative), excluding metadata
    * (`_manifest`, `_SUCCESS`, dotfiles). Driver-side, bounded by file
    * count — the same cost as the listing every unversioned read does. */
  private def listDataFiles(fs: FileSystem, root: Path, sub: Path): Seq[String] = {
    if (!fs.exists(sub)) return Nil
    val it = fs.listFiles(sub, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val rootUri = root.toUri.getPath.stripSuffix("/")
    while (it.hasNext) {
      val f = it.next().getPath
      val rel = f.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      val segs = rel.split('/')
      if (f.getName.endsWith(".parquet") &&
          !segs.exists(s => s.startsWith("_") || s.startsWith(".")))
        buf += rel
    }
    buf.toSeq.sorted
  }

  private def writeManifest(fs: FileSystem, dir: String, v: Long,
      files: Seq[String], meta: Seq[String] = Nil): Unit = {
    require(meta.forall(_.startsWith("#")), "manifest metadata lines must start with #")
    val dst = manifestPath(dir, v)
    fs.mkdirs(dst.getParent)
    val tmp = new Path(dst.getParent, dst.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(((meta ++ files.sorted).mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    // THE commit point: one atomic metadata op. The exists check is the
    // optimistic-concurrency guard (Delta's CAS-on-log-entry): a racing
    // writer that committed the same version first wins, and this
    // commit aborts with its data files unreferenced (vacuum-able)
    // rather than clobbering the winner's manifest. Best-effort on file
    // systems whose rename overwrites; exact on HDFS-style stores where
    // rename onto an existing path fails.
    require(!fs.exists(dst),
      s"concurrent commit detected: version $v already exists in $dir")
    require(fs.rename(tmp, dst), s"manifest commit failed for $dst")
  }

  /** The raw CAS commit, exposed for the concurrency spec: commits
    * `files` as version `v`, failing if `v` already exists. */
  private[lake] def commitManifest(spark: SparkSession, dir: String,
      v: Long, files: Seq[String]): Unit =
    writeManifest(fsOf(spark, dir), dir, v, files)

  /** Equality-delete (tombstone) files live at `version` — relative
    * paths recorded as `#del <path>` manifest lines. Empty for lakes
    * that never used [[deleteWhere]] (and after
    * [[materializeDeletes]]). */
  def deleteFilesAt(spark: SparkSession, dir: String, version: Long = -1L): Seq[String] = {
    val v = if (version >= 0) version else currentVersion(spark, dir)
    require(v >= 0, s"no manifest in $dir — call init() first")
    manifestLines(spark, dir, v).collect {
      case l if l.startsWith("#del ") => l.stripPrefix("#del ").trim
    }
  }

  /** Version an existing lake: v0 = its current files. Idempotent
    * (no-op if any manifest exists); returns the current version. */
  def init(spark: SparkSession, dir: String): Long = {
    val cur = currentVersion(spark, dir)
    if (cur >= 0) cur
    else {
      val fs = fsOf(spark, dir)
      writeManifest(fs, dir, 0L, listDataFiles(fs, new Path(dir), new Path(dir)))
      0L
    }
  }

  /** The table at `version` (latest if -1): reads EXACTLY the
    * manifest's files; partition columns come from the Hive paths via
    * basePath. Immune to concurrent commits by construction.
    * MERGE-ON-READ: any equality-delete tombstones recorded at this
    * version ([[deleteWhere]]) are applied as one anti-join on the
    * tombstone's key columns — readers never see deleted rows even
    * though the data files still physically hold them. */
  def snapshot(spark: SparkSession, dir: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else currentVersion(spark, dir)
    val files = filesAt(spark, dir, v)
    require(files.nonEmpty, s"version $version of $dir has no files")
    val df = spark.read.option("basePath", dir).option("mergeSchema", "true")
      .parquet(files.map(f => s"$dir/$f"): _*)
    val dels = deleteFilesAt(spark, dir, v)
    if (dels.isEmpty) df
    else {
      val tomb = spark.read.parquet(dels.map(d => s"$dir/$d"): _*)
      // null-safe (<=>), like every other key match in merge
      // resolution: a base row whose key column is null must still be
      // removed when its tombstone carries that null key — the
      // usingColumns overload's EqualTo would never match it
      df.join(tomb, tomb.columns.toSeq
        .map(k => df(k) <=> tomb(k)).reduce(_ && _), "left_anti")
    }
  }

  /** MERGE-ON-READ equality delete (Iceberg's equality-delete files /
    * Hudi's MOR tombstones, on the manifest protocol): rows matching
    * `pred` are deleted by COMMITTING THEIR KEYS, not by rewriting
    * their partitions — write cost is O(matching keys), zero data
    * files touched, commit is the same atomic manifest rename, old
    * versions still read pre-delete (time travel). The keys land as a
    * parquet of `keyCols` under `_deletes/` and ride the manifest as
    * `#del` lines; [[snapshot]] applies them as one anti-join.
    *
    * This is THE 100 TB deletion path (a GDPR user erasure touches a
    * key list, not a petabyte of partitions); the read-side anti-join
    * costs until [[materializeDeletes]] compacts — the classic MOR
    * trade. Every tombstone on one table must use the SAME `keyCols`
    * (enforced). Returns the committed version (unchanged when
    * nothing matches).
    *
    * @param changeFeed optional (dir, batchId): also publish the FULL
    *   deleted rows as a `_action='delete'` feed increment (same
    *   write-once pre-commit contract as the merge paths), so CDC
    *   replicas converge across MOR deletes too — a feed consumer
    *   replays the increment as an ordinary delete batch. */
  def deleteWhere(spark: SparkSession, dir: String,
      pred: org.apache.spark.sql.Column, keyCols: Seq[String],
      changeFeed: Option[(String, Long)] = None): Long = {
    require(keyCols.nonEmpty, "deleteWhere needs at least one key column")
    val v = init(spark, dir)
    val carried = deleteFilesAt(spark, dir, v)
    if (carried.nonEmpty) {
      val prior = spark.read.parquet(s"$dir/${carried.head}").columns.toSeq
      require(prior.sorted == keyCols.sorted,
        s"tombstone key mismatch: table already has equality deletes on " +
          s"(${prior.mkString(", ")}), got (${keyCols.mkString(", ")})")
    }
    // keys resolve against the MOR snapshot: already-deleted rows
    // can't be re-tombstoned, and the pred sees what a reader sees
    val deletedRows = snapshot(spark, dir, v).filter(pred)
    val keys = deletedRows.select(keyCols.map(col): _*).distinct()
    if (keys.isEmpty) return v
    // feed increment lands BEFORE the commit (resolution against the
    // immutable snapshot v — replay-consistent like the merge paths)
    changeFeed.foreach { case (fd, batchId) =>
      graft.ops.MergeData.writeFeedIncrement(spark, fd, batchId,
        deletedRows.withColumn("_action", lit("delete")))
    }
    val fs = fsOf(spark, dir)
    // UNIQUE staging path per attempt (never overwrite): a racing
    // writer that loses the manifest CAS must not have first deleted
    // the winner's already-committed tombstone files — same
    // never-colliding append discipline as the data-file path
    val delRel = f"_deletes/v${v + 1}%06d_" +
      java.util.UUID.randomUUID().toString.take(8)
    // one file per tombstone commit: erasure-style key lists are small
    // by use-case (the read side anti-joins them, usually broadcast).
    // A delete wide enough to make this file large is a rewrite-class
    // operation — use the COW mergeInto with __delete instead.
    keys.coalesce(1).write.mode("errorifexists").parquet(s"$dir/$delRel")
    val it = fs.listFiles(new Path(dir, delRel), false)
    val delFiles = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next().getPath.getName
      if (f.endsWith(".parquet")) delFiles += s"$delRel/$f"
    }
    require(delFiles.nonEmpty, s"tombstone write produced no files under $delRel")
    writeManifest(fs, dir, v + 1, filesAt(spark, dir, v),
      meta = (carried ++ delFiles).map(f => s"#del $f"))
    v + 1
  }

  /** Compact MERGE-ON-READ tombstones into the data (Hudi's
    * compaction): ONLY partitions physically holding tombstoned rows
    * are rewritten from the MOR snapshot; the new manifest drops the
    * `#del` lines. Work is bounded by the affected partitions — the
    * same COW scope as a merge — and old versions still time-travel
    * to the tombstoned (and pre-delete) states. Required before
    * [[mergeInto]]/[[optimize]] (both refuse while tombstones exist:
    * a rewrite that carried stale tombstones could re-delete a
    * re-inserted key, and one that dropped them would resurrect
    * deleted rows — the sequence-number machinery real formats carry
    * is out of scope, so the discipline is compact-then-merge). */
  def materializeDeletes(spark: SparkSession, dir: String,
      partitionKeys: Seq[String]): Long = {
    val v = init(spark, dir)
    val dels = deleteFilesAt(spark, dir, v)
    if (dels.isEmpty) return v
    val fs = fsOf(spark, dir)
    val live = filesAt(spark, dir, v)
    val tomb = spark.read.parquet(dels.map(d => s"$dir/$d"): _*)
    // affected partitions = those whose RAW files still hold a
    // tombstoned row (bounded driver collect: distinct partition
    // values of the deleted keys)
    val raw = spark.read.option("basePath", dir).option("mergeSchema", "true")
      .parquet(live.map(f => s"$dir/$f"): _*)
    val affectedRows = raw.join(tomb, tomb.columns.toSeq
        .map(k => raw(k) <=> tomb(k)).reduce(_ && _), "left_semi")
      .select(partitionKeys.map(col): _*).distinct().collect()
    val affectedDirs = affectedRows.map { r =>
      partitionKeys.zipWithIndex.map { case (k, i) =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(k, Option(r.get(i)).map(String.valueOf).orNull)
      }.mkString("/")
    }.toSet
    def underAffected(rel: String) = affectedDirs.exists(d => rel.startsWith(d + "/"))
    if (affectedDirs.isEmpty) { // tombstones matched nothing on disk
      writeManifest(fs, dir, v + 1, live)
      return v + 1
    }
    val affectedPred = affectedRows.map { r =>
      partitionKeys.zipWithIndex.map { case (k, i) =>
        col(k) <=> lit(r.get(i))
      }.reduce(_ && _)
    }.reduce(_ || _)
    val clean = snapshot(spark, dir, v).filter(affectedPred)
    val before = affectedDirs.flatMap(d =>
      listDataFiles(fs, new Path(dir), new Path(dir, d))).toSet
    clean.repartition(partitionKeys.map(col): _*)
      .write.mode("append").partitionBy(partitionKeys: _*).parquet(dir)
    val after = affectedDirs.flatMap(d =>
      listDataFiles(fs, new Path(dir), new Path(dir, d))).toSet
    val newFiles = (after -- before).toSeq.sorted
    writeManifest(fs, dir, v + 1, live.filterNot(underAffected) ++ newFiles)
    v + 1
  }

  /** Row-level MERGE INTO with snapshot isolation — the EXACT
    * semantics of [[graft.ops.MergeData.mergeInto]] (update/delete/
    * insert on rowKey, schema evolution, touched-partition scope; both
    * paths call the one shared [[graft.ops.MergeData.resolveMerge]]
    * core) committed through the manifest instead of a directory swap.
    * New data files land as APPENDED parquet parts in the touched
    * partition directories (Spark's task-UUID part names never
    * collide); until the manifest rename they are invisible, after it
    * they are the partition. Old files stay for time travel until
    * [[vacuum]].
    *
    * @param changeFeed optional (dir, batchId): publish this batch's
    *   resolved Delta-CDF increment (same write-once pre-commit
    *   contract as the swap path — see
    *   [[graft.ops.MergeData.emitChangeFeed]]), so snapshot isolation
    *   and CDC ride ONE write path.
    * @param txn optional (txnId, batchId) idempotence marker (Delta's
    *   `txn` action): if `batchId <=` [[lastTxn]] for `txnId`, the
    *   batch already committed — return the current version WITHOUT
    *   committing again. A replaying streaming sink therefore advances
    *   the version exactly once per batch.
    * Returns the committed (or already-committed) version. */
  def mergeInto(spark: SparkSession, dir: String, updates: DataFrame,
      partitionKeys: Seq[String], rowKey: Seq[String],
      changeFeed: Option[(String, Long)] = None,
      txn: Option[(String, Long)] = None): Long = {
    require(rowKey.nonEmpty, "mergeInto needs at least one rowKey column")
    val v = init(spark, dir)
    require(deleteFilesAt(spark, dir, v).isEmpty,
      s"$dir has unmaterialized equality deletes: run materializeDeletes() " +
        "before merging (stale tombstones could re-delete re-inserted keys)")
    txn match {
      case Some((id, batchId)) if lastTxn(spark, dir, id) >= batchId =>
        return currentVersion(spark, dir) // replayed batch: already committed
      case _ =>
    }
    val live = filesAt(spark, dir, v)
    val fs = fsOf(spark, dir)

    val hasDelete = updates.columns.contains("__delete")
    val del = if (hasDelete) coalesce(col("__delete"), lit(false)) else lit(false)
    val batch = updates.persist()
    try {
      // base = the SNAPSHOT's touched-partition rows (partition-pruned:
      // the resolve core's filter on partition columns prunes at
      // planning time)
      val res = graft.ops.MergeData.resolveMerge(
        snapshot(spark, dir, v), batch, partitionKeys, rowKey, del)
      val touchedDirs = res.touchedDirs.toSet
      def underTouched(rel: String) =
        touchedDirs.exists(d => rel.startsWith(d + "/"))

      // the feed increment lands BEFORE the commit (crash-consistent:
      // actions resolve against snapshot v, which no commit mutates)
      changeFeed.foreach { case (fd, batchId) =>
        graft.ops.MergeData.emitChangeFeed(spark, res, batch, rowKey, del, fd, batchId)
      }

      // write new files: append-only, so pre-listing the touched dirs
      // (bounded by the batch) identifies exactly this commit's files
      val before = touchedDirs.flatMap(d =>
        listDataFiles(fs, new Path(dir), new Path(dir, d))).toSet
      res.merged.repartition(partitionKeys.map(col): _*)
        .write.mode("append").partitionBy(partitionKeys: _*).parquet(dir)
      val after = touchedDirs.flatMap(d =>
        listDataFiles(fs, new Path(dir), new Path(dir, d))).toSet
      val newFiles = (after -- before).toSeq.sorted

      val next = live.filterNot(underTouched) ++ newFiles
      writeManifest(fs, dir, v + 1, next,
        meta = txn.map { case (id, b) => s"#txn $id $b" }.toSeq)
      v + 1
    } finally batch.unpersist()
  }

  /** Skip-index pruned read of a snapshot: the index must describe
    * exactly this version's manifest (build it from [[snapshot]], or
    * advance it with [[SkipIndex.refreshForFiles]] after a merge).
    * Because validation is against the manifest — not the dir listing,
    * which still holds superseded files — pruned reads time-travel:
    * version N's index keeps serving version N after later commits. */
  def prunedRead(spark: SparkSession, dir: String,
      idx: org.apache.spark.sql.DataFrame,
      preds: Seq[(String, Double, Double)],
      version: Long = -1L): DataFrame = {
    require(deleteFilesAt(spark, dir, version).isEmpty,
      "pruned reads bypass merge-on-read tombstones: materializeDeletes() first")
    SkipIndex.prunedReadMultiFiles(spark, dir, idx, preds,
      filesAt(spark, dir, version).map(f => s"$dir/$f"))
  }

  /** Bloom-index pruned point/IN lookup of a snapshot — the
    * [[prunedRead]] analogue for [[BloomIndex]]: the index must
    * describe exactly this version's manifest (build it from the
    * version's files, or advance it with [[BloomIndex.refreshForFiles]]
    * after a merge). Validation is against the manifest, so lookups
    * time-travel: version N's index keeps serving version N after
    * later commits, even though the directory holds newer files. */
  def prunedReadIn(spark: SparkSession, dir: String,
      idx: org.apache.spark.sql.DataFrame, c: String,
      probes: Seq[org.apache.spark.sql.Column],
      version: Long = -1L): DataFrame = {
    require(deleteFilesAt(spark, dir, version).isEmpty,
      "pruned reads bypass merge-on-read tombstones: materializeDeletes() first")
    BloomIndex.prunedReadInFiles(spark, dir, idx, c, probes,
      filesAt(spark, dir, version).map(f => s"$dir/$f"))
  }

  /** OPTIMIZE within the manifest protocol: partitions holding more
    * than `targetFilesPerPartition` live files are rewritten compacted
    * (one shuffle clustered on the partition keys, new files appended),
    * and the new manifest swaps the small files for the compacted ones.
    * Pure layout change: the snapshot's rows are identical, old
    * versions still see the old files (time travel intact), and work
    * is bounded by the partitions that actually need compacting.
    *
    * @param zorder optional clustering key (Delta's `OPTIMIZE ZORDER
    *   BY`): pass a [[Maintenance.mortonKey]]/[[Maintenance.gridBucket]]
    *   composition. When set, EVERY partition is rewritten (re-cluster
    *   semantics, like Delta) as ~`targetFilesPerPartition` files per
    *   partition, range-split and sorted on the key — each rewritten
    *   file covers a disjoint zkey slice, so per-file min/max boxes are
    *   tight on every interleaved dimension and a footer-built
    *   [[SkipIndex]] over the snapshot prunes multi-predicate reads.
    *   The key is layout only: it is computed, range-partitioned on,
    *   sorted by, and dropped before the write.
    * Returns the committed version (unchanged if nothing to do). */
  def optimize(spark: SparkSession, dir: String,
      partitionKeys: Seq[String], targetFilesPerPartition: Int = 1,
      zorder: Option[org.apache.spark.sql.Column] = None): Long = {
    require(targetFilesPerPartition >= 1, "need targetFilesPerPartition >= 1")
    val v = init(spark, dir)
    require(deleteFilesAt(spark, dir, v).isEmpty,
      s"$dir has unmaterialized equality deletes: run materializeDeletes() " +
        "before optimize (a raw-file rewrite would resurrect deleted rows)")
    val live = filesAt(spark, dir, v)
    val byDir = live.groupBy(f => f.take(math.max(f.lastIndexOf('/'), 0)))
    val targets = byDir.filter { case (d, fs0) =>
      d.nonEmpty &&
        (if (zorder.isDefined) fs0.nonEmpty // re-cluster everything
         else fs0.size > targetFilesPerPartition) }
    if (targets.isEmpty) return v
    val fs = fsOf(spark, dir)
    val targetDirs = targets.keySet
    val before = targetDirs.flatMap(d =>
      listDataFiles(fs, new Path(dir), new Path(dir, d))).toSet
    val rows = spark.read.option("basePath", dir).option("mergeSchema", "true")
      .parquet(targets.values.flatten.map(f => s"$dir/$f").toSeq: _*)
    val clustered = zorder match {
      case Some(z) =>
        // range-split on (partition, zkey): each task holds one
        // contiguous zkey slice of one partition (a slice straddling a
        // partition boundary just splits into two files at the write),
        // and the in-task sort tightens row-group stats too
        val keys = partitionKeys.map(col) :+ col("__zkey")
        rows.withColumn("__zkey", z)
          .repartitionByRange(targets.size * targetFilesPerPartition, keys: _*)
          .sortWithinPartitions(keys: _*)
          .drop("__zkey")
      case None => rows.repartition(partitionKeys.map(col): _*)
    }
    clustered.write.mode("append").partitionBy(partitionKeys: _*).parquet(dir)
    val after = targetDirs.flatMap(d =>
      listDataFiles(fs, new Path(dir), new Path(dir, d))).toSet
    val newFiles = (after -- before).toSeq.sorted
    val replaced = targets.values.flatten.toSet
    writeManifest(fs, dir, v + 1, live.filterNot(replaced) ++ newFiles)
    v + 1
  }

  /** Metadata-only COUNT(*) of a snapshot: sums parquet footer record
    * counts over the version's manifest files — one distributed footer
    * read per file, ZERO data rows scanned. At 100 TB this answers the
    * most common query of all at listing cost. Exact by the parquet
    * contract (the footer's record count is authoritative); refuses
    * under pending merge-on-read tombstones, whose row effect cannot
    * be known without scanning (materialize first, or count the
    * [[snapshot]]). */
  def fastRowCount(spark: SparkSession, dir: String, version: Long = -1L): Long = {
    val v = if (version >= 0) version else currentVersion(spark, dir)
    require(deleteFilesAt(spark, dir, v).isEmpty,
      "fastRowCount under unmaterialized equality deletes would overcount: " +
        "materializeDeletes() first or count the snapshot")
    val files = filesAt(spark, dir, v).map(f => s"$dir/$f")
    // ship the SESSION's Hadoop conf to the footer tasks (fs.* keys,
    // object-store credentials): a fresh Configuration() would read
    // local disk fine but fail to authenticate anywhere real
    val hconf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 64)))
      .map { p =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new Path(p), hconf.value.value))
        try r.getRecordCount finally r.close()
      }.sum().toLong
  }

  /** Delete data files unreferenced by the newest `keepVersions`
    * manifests, the older manifests themselves, and any equality-delete
    * tombstone files no retained manifest references. After vacuum,
    * time travel reaches back exactly `keepVersions` versions. */
  def vacuum(spark: SparkSession, dir: String, keepVersions: Int): Unit = {
    require(keepVersions >= 1, "must keep at least the current version")
    val fs = fsOf(spark, dir)
    val cur = currentVersion(spark, dir)
    require(cur >= 0, s"no manifest in $dir")
    val keepFrom = math.max(0L, cur - keepVersions + 1)
    val referenced = (keepFrom to cur)
      .flatMap(v => filesAt(spark, dir, v)).toSet
    val all = listDataFiles(fs, new Path(dir), new Path(dir))
    all.filterNot(referenced).foreach(rel =>
      fs.delete(new Path(dir, rel), false))
    // tombstones live under _deletes/ (invisible to listDataFiles):
    // drop the ones only pre-retention manifests referenced
    val refDels = (keepFrom to cur)
      .flatMap(v => deleteFilesAt(spark, dir, v)).toSet
    val delRoot = new Path(dir, "_deletes")
    if (fs.exists(delRoot)) {
      val rootUri = new Path(dir).toUri.getPath.stripSuffix("/")
      val it = fs.listFiles(delRoot, true)
      while (it.hasNext) {
        val f = it.next().getPath
        val rel = f.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
        if (f.getName.endsWith(".parquet") && !refDels.contains(rel))
          fs.delete(f, false)
      }
    }
    (0L until keepFrom).foreach { v =>
      val p = manifestPath(dir, v)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }
}
