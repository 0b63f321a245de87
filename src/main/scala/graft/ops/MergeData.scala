package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `merge-data.py` / `collect_data_metadata.py` semantics
  * (SURVEY.md §2.4 U1-U2, §2.2 P1).
  *
  * Reference: for each (site, participant, metric) group, read every
  * per-day csv.gz, attach lineage columns, `pd.concat` (aligning columns
  * by name, NaN-filling gaps), write one merged file
  * (`merge-data.py:54-100`).
  *
  * Spark-first: one scan of all files; lineage comes from the path
  * (partition columns / regexp over `input_file_name()`), the concat is
  * the scan itself, schema drift across files is `unionByName(
  * allowMissingColumns = true)`, and "one output file per group" is
  * `partitionBy(site, participant, metric)` with dynamic partition
  * overwrite — per-group idempotent rewrite, which is also the U2
  * incremental story (re-running overwrites only touched groups).
  * No driver-side loop over groups: at 100 TB the groups are millions.
  */
object MergeData {

  /** P1: lineage columns the reference attaches to every merged row
    * (`merge-data.py:81-83`): file_timestamp (ISO string), site,
    * participant_id. Expects the scan to carry path-derived columns
    * already (see [[graft.lake.PathModel.parsePaths]]). */
  def withLineage(df: DataFrame): DataFrame =
    df.withColumn("file_timestamp",
      date_format(col("file_timestamp"), "yyyy-MM-dd'T'HH:mm:ss"))

  /** U1 cross-schema union: pandas `concat` aligns by column name and
    * fills missing with NaN; the Spark equivalent. */
  def unionDrift(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** U1+U2: merge a raw lake scan into a partitioned merged lake.
    * Dynamic partition overwrite = only groups present in `df` are
    * rewritten (the reference's skip-existing/--update flags both
    * degenerate to this idempotent behavior).
    *
    * The write clusters rows by the partition keys first: without it,
    * EVERY upstream task opens a file in EVERY group directory
    * (observed 286 files for 60 groups at sf0.1) — the small-files
    * problem that murders the downstream scan at lake scale. One
    * shuffle buys one file per group. A group too big for one task
    * would need a salt column appended to the repartition keys; these
    * per-(site,participant,metric) groups are day-file unions and stay
    * far below task size. */
  /** `format`: "parquet" (default) or "csv.gz" — the reference's two
    * output formats (merge-data.py:93-96 writes gzipped csv by default
    * with `--parquet` opting into parquet; we default the other way,
    * parquet being the only sane lake format at scale). Parity with the
    * reference's csv.gz deliverable is at the CONTENT level: the
    * reference writes site/participant_id/metric as data columns inside
    * each group's file (merge-data.py:81-83), so the csv.gz branch
    * partitions on COPIES and keeps the originals in the rows; the
    * directory layout itself is Hive-style (`key=value`), not the
    * reference's bare `site/participant/metric` nesting. */
  def writeMerged(spark: SparkSession, df: DataFrame, outDir: String,
      format: String = "parquet",
      keys: Seq[String] = Seq("site", "participant_id", "metric")): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      def writer(d: DataFrame, keys: Seq[String]) =
        // no keys (unpartitioned): keep the batch's parallelism —
        // repartition() on ZERO expressions hashes every row to one
        // partition, a single-task write
        (if (keys.isEmpty) d else d.repartition(keys.map(col): _*))
          .write
          .mode("overwrite")
          .partitionBy(keys: _*)
      format match {
        case "parquet" =>
          writer(df, keys).parquet(outDir)
        case "csv.gz" =>
          // Hive partitioning strips partition columns from file
          // contents; the reference's merged csv carries them as data
          // columns, so partition on copies and keep the originals
          val keyed = df
            .withColumn("_p_site", col("site"))
            .withColumn("_p_participant_id", col("participant_id"))
            .withColumn("_p_metric", col("metric"))
          writer(keyed, Seq("_p_site", "_p_participant_id", "_p_metric"))
            .option("header", "true")
            .option("compression", "gzip").csv(outDir)
        case other => throw new IllegalArgumentException(
          s"writeMerged format must be parquet or csv.gz, got $other")
      }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Row-level MERGE INTO over a Hive-partitioned parquet lake —
    * copy-on-write upsert/delete, the Delta/Hudi-style mutation layer
    * the reference's `--update` flag gestures at but only does at
    * whole-group granularity (merge-data.py:69-77 skip-existing).
    *
    * Semantics per `updates` row (matched on `rowKey` against base):
    *   matched  + `__delete` false/absent → base row replaced (UPDATE)
    *   matched  + `__delete` true         → base row dropped  (DELETE)
    *   unmatched + `__delete` false       → appended           (INSERT)
    *
    * Scale shape — the whole point of the COW design:
    *   - only partitions PRESENT in `updates` are read or rewritten:
    *     the touched partition set (collected anyway for the commit
    *     step) becomes a STATIC partition-column predicate on the base
    *     scan, so pruning happens at planning time (PartitionFilters
    *     in the scan node, no DPP reliance) and untouched data never
    *     enters the plan;
    *   - the matched/unmatched split is ONE left_anti + unionByName on
    *     `rowKey` — a single equi-join shuffle of just the touched
    *     partitions' rows, never a full-lake rewrite.
    *
    * `updates` must carry the partition columns, the `rowKey` columns,
    * and every data column of the base — and MAY carry new columns:
    * schema evolution (Delta's mergeSchema) null-fills the new columns
    * on untouched base rows, while a batch MISSING a base column is
    * rejected loudly (evolution adds, never drops). (An optional
    * boolean `__delete` marks deletions; a NULL `__delete` is
    * normalized to false, so an
    * outer-join-produced or CSV-empty marker upserts rather than
    * silently deleting). A DELETE-only batch still rewrites its
    * partition (COW); at 100 TB you batch deletes with the day's
    * upserts exactly like every COW table format does.
    *
    * Invariant: `rowKey` must uniquely locate a row WITHIN its
    * partition and a key's partition value must be stable — matching
    * is scoped to the batch's touched partitions (that is what buys
    * static pruning), so a key that moves partitions would append in
    * the new partition without removing the old row. Include the
    * partition columns in `rowKey` (or derive the partition from the
    * key, as q115 does with event_id → site) to satisfy it.
    * Null partition values are handled: matching is null-safe (`<=>`)
    * and the swap path uses Hive's `__HIVE_DEFAULT_PARTITION__`
    * rendering, the same directory the partitioned write produces.
    */
  /** @param changeFeed optional (dir, batchId): also emit this batch's
    *   resolved change rows — every applied update/insert/delete with an
    *   `_action` column; a DELETE of an absent key resolves to no row
    *   (it changed nothing) — under `dir/batch_id=N`. Each increment is
    *   WRITE-ONCE, committed by atomic rename, and emitted BEFORE the
    *   data swap: actions resolve against the pre-merge base, so a
    *   replayed batch (crash-restart) keeps its original, correctly
    *   resolved increment instead of re-resolving against the merged
    *   state into zero-deltas. Downstream incremental consumers read
    *   the feed append-only. The Delta change-data-feed analogue. */
  def mergeInto(spark: SparkSession, baseDir: String, updates: DataFrame,
      partitionKeys: Seq[String], rowKey: Seq[String],
      changeFeed: Option[(String, Long)] = None): Unit = {
    require(rowKey.nonEmpty, "mergeInto needs at least one rowKey column")
    val hasDelete = updates.columns.contains("__delete")
    // null __delete = upsert: without the coalesce a null marker's key
    // would still anti-join the base row away while the replacement row
    // is dropped by filter(!del) — silent data loss (null is not true)
    val del = if (hasDelete) coalesce(col("__delete"), lit(false)) else lit(false)
    // the merge consumes the batch three times (partition set, matched
    // anti-join, applied rows) — materialize it ONCE; it is bounded by
    // batch size, never lake size, so caching it is always safe
    val batch = updates.persist()
    try {
      mergeIntoImpl(spark, baseDir, batch, partitionKeys, rowKey, del, changeFeed)
    } finally batch.unpersist()
  }

  /** Replay a change feed (the `changeFeed` output of [[mergeInto]])
    * onto a replica lake — CDC replication: a replica seeded from the
    * same base converges to the primary by applying feed batches in
    * batch_id order, because each feed batch IS a valid merge batch
    * (`_action='delete'` rows become `__delete`). The driver-side loop
    * is bounded by the number of UNAPPLIED batches (pass `sinceBatch`
    * = the replica's high-water mark, exactly like any log consumer),
    * and each application touches only that batch's partitions.
    * `untilBatch` bounds the replay from above (point-in-time restore,
    * or a catch-up that must stop at a published watermark). */
  def applyChangeFeed(spark: SparkSession, feedDir: String,
      replicaDir: String, partitionKeys: Seq[String], rowKey: Seq[String],
      sinceBatch: Long = -1L, untilBatch: Long = Long.MaxValue): Unit = {
    // mergeSchema: feed batches published before a schema evolution sit
    // next to evolved ones; the replica applies the union schema.
    // Uniform footers (the common case) serve it driver-side instead
    // of paying the inference job (guide §2.4).
    val feed0 =
      graft.lake.Versioned.uniformDirSchemaLocal(spark, feedDir) match {
        case Some(s) => spark.read.schema(s).parquet(feedDir)
        case None => spark.read.option("mergeSchema", "true").parquet(feedDir)
      }
    val feed = feed0
      .filter(col("batch_id") > sinceBatch && col("batch_id") <= untilBatch)
    val batchIds = feed.select("batch_id").distinct()
      .collect().map(_.getAs[Number]("batch_id").longValue()).sorted
    batchIds.foreach { id =>
      // preimages describe what a batch REPLACED — replay applies only
      // the post-state rows (inserts, postimages, deletes)
      val b = feed.filter(col("batch_id") === id &&
          col("_action") =!= "update_preimage")
        .withColumn("__delete", col("_action") === "delete")
        .drop("_action", "batch_id")
      mergeInto(spark, replicaDir, b, partitionKeys, rowKey)
    }
  }

  /** Per-group aggregate deltas from a change feed — incremental
    * materialized-view maintenance without touching the base lake:
    * `new_sum = old_sum + delta_sum`, `new_count = old_count +
    * delta_count`. Possible precisely because the feed carries
    * preimages: an update contributes (postimage − preimage), a delete
    * subtracts the removed row, an insert adds the new one. One
    * aggregate over the feed increment — the view never rescans data. */
  def feedDeltas(feed: DataFrame, groupKeys: Seq[String],
      valueCol: String): DataFrame = {
    val sign = when(col("_action").isin("insert", "update_postimage"), 1)
      .otherwise(-1)
    feed.groupBy(groupKeys.map(col): _*)
      .agg(
        sum(sign * col(valueCol)).as("delta_sum"),
        sum(when(col("_action") === "insert", 1L)
          .when(col("_action") === "delete", -1L).otherwise(0L))
          .as("delta_count"))
  }

  /** The matched/unmatched resolution shared by BOTH commit strategies
    * (swap-commit [[mergeIntoImpl]] and manifest-commit
    * [[graft.lake.Versioned.mergeInto]]) — extracting it is what keeps
    * their semantics from drifting: touched-partition scope, survivors
    * anti-join, evolution guard and `__delete` handling are defined
    * exactly once.
    *
    * @param baseAll the WHOLE base table (a mergeSchema dir read, or a
    *   versioned snapshot); resolution filters it to touched partitions
    */
  private[graft] final case class MergeResolution(
      touchedRows: Seq[org.apache.spark.sql.Row],
      touchedDirs: Seq[String],
      base: DataFrame,     // pre-merge rows of the touched partitions
      applied: DataFrame,  // the batch's upsert rows (no __delete)
      merged: DataFrame)   // post-merge rows of the touched partitions

  private[graft] def resolveMerge(baseAll: DataFrame, updates: DataFrame,
      partitionKeys: Seq[String], rowKey: Seq[String],
      del: org.apache.spark.sql.Column): MergeResolution = {
    // one driver-side pass over the batch's distinct partitions: it is
    // bounded by the batch (a day's CDC touches few partitions), and it
    // buys BOTH static partition pruning on the read and the commit's
    // swap/replace list. UNPARTITIONED (no keys): the one "partition"
    // is the table root — touchedDirs' "" means "everything under the
    // root" to every consumer (see [[graft.lake.Versioned.underDir]])
    if (partitionKeys.isEmpty) {
      require(!updates.isEmpty, "mergeInto got an empty updates batch")
      val base = baseAll
      val survivors = base.join(
        updates.select(rowKey.map(col): _*).distinct(), rowKey, "left_anti")
      val applied = updates.filter(!del).drop("__delete")
      val dropped = base.columns.toSet -- applied.columns.toSet
      require(dropped.isEmpty,
        s"mergeInto batch is missing base columns ${dropped.mkString(", ")}: " +
          "batches must carry every base data column (evolution adds columns, never drops)")
      return MergeResolution(Seq(org.apache.spark.sql.Row()), Seq(""),
        base, applied,
        survivors.unionByName(applied, allowMissingColumns = true))
    }
    val touchedRows = updates.select(partitionKeys.map(col): _*)
      .distinct().collect().toSeq
    require(touchedRows.nonEmpty, "mergeInto got an empty updates batch")
    // null-safe (<=>): a null partition value must still match the
    // base's null-partition rows, or those rows silently duplicate
    val touchedPred = touchedRows.map { r =>
      partitionKeys.zipWithIndex.map { case (k, i) =>
        col(k) <=> lit(r.get(i))
      }.reduce(_ && _)
    }.reduce(_ || _)
    // the same strings the partitioned write renders as directories
    // (nulls → __HIVE_DEFAULT_PARTITION__)
    val touchedDirs = touchedRows.map { r =>
      partitionKeys.zipWithIndex.map { case (k, i) =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(k, Option(r.get(i)).map(String.valueOf).orNull)
      }.mkString("/")
    }
    val base = baseAll.filter(touchedPred)
    val survivors = base.join(
      updates.select(rowKey.map(col): _*).distinct(), rowKey, "left_anti")
    val applied = updates.filter(!del).drop("__delete")
    // Schema evolution, U1's drift rule applied to the mutation layer:
    // a batch may ADD columns (old rows null-fill below) but never drop
    // one — a missing base column would silently null half the table,
    // so reject loudly instead.
    val dropped = base.columns.toSet -- applied.columns.toSet
    require(dropped.isEmpty,
      s"mergeInto batch is missing base columns ${dropped.mkString(", ")}: " +
        "batches must carry every base data column (evolution adds columns, never drops)")
    val merged = survivors.unionByName(applied, allowMissingColumns = true)
    MergeResolution(touchedRows, touchedDirs, base, applied, merged)
  }

  /** Change-feed emission shared by both commit strategies. Actions
    * resolve against the PRE-merge base (rowKey-shaped joins over the
    * touched partitions only) and must be called BEFORE the commit
    * mutates visible state. Delta-CDF row classes — preimages carry
    * the OLD row, which is what makes downstream incremental aggregate
    * maintenance possible (delta = postimage − preimage):
    *   insert            — batch row, key absent from base
    *   update_postimage  — batch row, key present
    *   update_preimage   — the BASE row that postimage replaced
    *   delete            — the BASE row removed (absent key = no row)
    *
    * WRITE-ONCE per batch_id, committed by atomic rename. Actions
    * resolve against the PRE-merge base, so a batch REPLAYED after
    * its commit landed would re-resolve against the merged state
    * and publish garbage (pre == post zero-deltas, inserts become
    * self-updates) — exactly what a crashed-and-restarted streaming
    * merge does. Skipping an increment that already exists keeps the
    * original, correctly-resolved actions; and because the feed is
    * emitted BEFORE the commit, every crash window replays
    * consistently (feed absent → base still pre-merge → correct
    * re-resolve; feed present → skip). The staging+rename makes the
    * increment all-or-nothing, so a crash mid-write can't leave a
    * half increment that the skip check would then trust. */
  private[graft] def emitChangeFeed(spark: SparkSession,
      res: MergeResolution, updates: DataFrame, rowKey: Seq[String],
      del: org.apache.spark.sql.Column, dir: String, batchId: Long): Unit = {
    val feedRoot = new org.apache.hadoop.fs.Path(dir)
    val feedFs = feedRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(feedRoot, s"batch_id=$batchId")
    if (!feedFs.exists(target))
      writeFeedIncrement(spark, dir, batchId,
        resolveFeedActions(res, updates, rowKey, del))
  }

  /** Resolve a batch's Delta-CDF action rows against its PRE-merge
    * base (rowKey-shaped joins over the touched partitions only) —
    * shared by the swap path's [[emitChangeFeed]] and the manifest
    * path's staged emission ([[stageFeedIncrement]]). */
  private[graft] def resolveFeedActions(res: MergeResolution,
      updates: DataFrame, rowKey: Seq[String],
      del: org.apache.spark.sql.Column): DataFrame = {
    // feed rows carry the EVOLVED schema: inserts/postimages bring
    // the batch's new columns, preimages/deletes (old base rows)
    // null-fill them via the allowMissingColumns unions below
    val base = res.base
    val upserts = res.applied
    val delKeys = updates.filter(del).select(rowKey.map(col): _*).distinct()
    val upsKeys = upserts.select(rowKey.map(col): _*).distinct()
    def tag(d: DataFrame, action: String) =
      d.withColumn("_action", lit(action))
    tag(upserts.join(base.select(rowKey.map(col): _*).distinct(),
      rowKey, "left_anti"), "insert")
      .unionByName(tag(upserts.join(
        base.select(rowKey.map(col): _*).distinct(), rowKey, "left_semi"),
        "update_postimage"))
      .unionByName(tag(base.join(upsKeys, rowKey, "left_semi"),
        "update_preimage"), allowMissingColumns = true)
      .unionByName(tag(base.join(delKeys, rowKey, "left_semi"), "delete"),
        allowMissingColumns = true)
  }

  private def feedFs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def feedStagePath(dir: String, batchId: Long, base: Long) =
    new org.apache.hadoop.fs.Path(dir,
      if (base < 0) s"_stg_batch_id=$batchId"
      else s"_stg_batch_id=$batchId.base=$base")
  private def feedFinalPath(dir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(dir, s"batch_id=$batchId")

  /** The staged increment for `batchId`, if any, with the base version
    * it was resolved against (-1 for stages written before base
    * tracking, or by the base-less swap path). */
  private def findStaged(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      batchId: Long): Option[(org.apache.hadoop.fs.Path, Long)] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) return None
    val exact = s"_stg_batch_id=$batchId"
    val pfx = s"_stg_batch_id=$batchId.base="
    fs.listStatus(root).iterator.map(_.getPath).collectFirst {
      case p if p.getName == exact => (p, -1L)
      case p if p.getName.startsWith(pfx) =>
        (p, p.getName.stripPrefix(pfx).toLong)
    }
  }

  /** Stage `batch_id=N`'s increment WITHOUT publishing it — the
    * `_`-prefixed staging dir is invisible to feed readers. The
    * manifest commit path must not publish an increment before its
    * version is actually reserved: a writer that loses the commit CAS
    * aborts with NO visible feed trace (emitting pre-commit would keep
    * the loser's stale increment forever, undermining exactly what the
    * CAS detects). First resolution wins: an increment already staged
    * (by a crashed prior attempt of the same writer, resolved against
    * the same pre-merge snapshot) is KEPT rather than re-resolved —
    * that is what makes crash replay consistent — and an increment
    * already PUBLISHED means nothing to do. `actions` is by-name and
    * only resolved when a fresh stage is actually written. The staged
    * write itself is all-or-nothing (tmp dir + atomic rename), so a
    * crash mid-write can't leave a half increment the keep-check would
    * then trust.
    *
    * First-resolution-wins is qualified BY BASE VERSION (`baseVersion`
    * = the snapshot version the actions resolved against): a stage is
    * kept only when it was resolved against the SAME base — that is
    * the crash-replay case. A leftover stage with a different base is
    * a writer that lost the commit CAS and crashed before its discard;
    * its resolution is stale (the winner changed the base), so keeping
    * it would publish CDF rows that disagree with what the commit
    * actually did. Such stages are discarded and restaged fresh. */
  private[graft] def stageFeedIncrement(spark: SparkSession, dir: String,
      batchId: Long, actions: => DataFrame, baseVersion: Long = -1L): Unit = {
    val fs = feedFs(spark, dir)
    if (fs.exists(feedFinalPath(dir, batchId))) return
    findStaged(fs, dir, batchId) match {
      case Some((_, base)) if base == baseVersion => return // crash replay
      case Some((p, _)) => fs.delete(p, true) // stale base: restage
      case None =>
    }
    val tmp = new org.apache.hadoop.fs.Path(
      dir + "_feedstg_" + java.util.UUID.randomUUID().toString.take(8))
    val dst = feedStagePath(dir, batchId, baseVersion)
    try {
      actions.write.mode("overwrite").parquet(tmp.toString)
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
      require(fs.rename(tmp, dst), s"feed stage: rename $tmp -> $dst failed")
    } finally fs.delete(tmp, true)
  }

  /** Publish a staged increment after its commit landed: one atomic
    * rename into `batch_id=N`. No-op when already published (a
    * leftover stage is dropped — write-once keeps the published copy)
    * or when nothing is staged. Also called on the txn-replay skip
    * path, so an increment orphaned by a crash between the manifest
    * commit and its promote still gets published. */
  private[graft] def promoteFeedIncrement(spark: SparkSession, dir: String,
      batchId: Long): Unit = {
    val fs = feedFs(spark, dir)
    val dst = feedFinalPath(dir, batchId)
    val stg = findStaged(fs, dir, batchId)
    if (fs.exists(dst)) { stg.foreach(s => fs.delete(s._1, true)); return }
    stg.foreach { case (p, _) =>
      require(fs.rename(p, dst), s"feed promote: rename $p -> $dst failed") }
  }

  /** Reap a staged increment after an aborted commit (a lost CAS):
    * the abort means another writer owns the version, so the staged
    * resolution is stale — the retry re-resolves fresh. */
  private[graft] def discardStagedIncrement(spark: SparkSession, dir: String,
      batchId: Long): Unit = {
    val fs = feedFs(spark, dir)
    findStaged(fs, dir, batchId).foreach(s => fs.delete(s._1, true))
  }

  /** Feed RETENTION: delete published increments with `batch_id <=
    * uptoBatch`. A change feed is an append-only log and grows
    * forever without this; the safe bound is the MINIMUM high-water
    * mark across consumers (a streaming replica's mark is in its own
    * manifest txn map — [[graft.lake.Versioned.lastTxn]]; a batch
    * consumer's is whatever `sinceBatch` it persists), because a
    * consumer can never need an increment at or below its mark again.
    * Staged (unpublished) increments are never touched. Returns the
    * reaped batch ids. */
  def vacuumFeed(spark: SparkSession, feedDir: String,
      uptoBatch: Long): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(feedDir)
    val fs = feedFs(spark, feedDir)
    if (!fs.exists(root)) return Nil
    val reaped = fs.listStatus(root).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("batch_id=") =>
        n.stripPrefix("batch_id=").toLong }
      .filter(_ <= uptoBatch).sorted
    reaped.foreach { id =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"batch_id=$id"), true)
    }
    reaped
  }

  /** The write-once increment commit shared by every feed emitter
    * ([[emitChangeFeed]], [[graft.lake.Versioned.deleteWhere]]): stage,
    * then atomically rename into `batch_id=N`; an increment that
    * already exists is kept untouched (see [[emitChangeFeed]] for why
    * keeping the original is what makes crash replay consistent). */
  private[graft] def writeFeedIncrement(spark: SparkSession, dir: String,
      batchId: Long, actions: DataFrame): Unit = {
    val feedRoot = new org.apache.hadoop.fs.Path(dir)
    val feedFs = feedRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(feedRoot, s"batch_id=$batchId")
    if (feedFs.exists(target)) return
    val stg = new org.apache.hadoop.fs.Path(
      dir + "_feedstg_" + java.util.UUID.randomUUID().toString.take(8))
    try {
      actions.write.mode("overwrite").parquet(stg.toString)
      feedFs.mkdirs(feedRoot)
      require(feedFs.rename(stg, target),
        s"feed commit: rename $stg -> $target failed")
    } finally feedFs.delete(stg, true)
  }

  private def mergeIntoImpl(spark: SparkSession, baseDir: String,
      updates: DataFrame, partitionKeys: Seq[String], rowKey: Seq[String],
      del: org.apache.spark.sql.Column,
      changeFeed: Option[(String, Long)]): Unit = {
    // mergeSchema: an evolved lake holds files written before a column
    // existed next to files written after; the union schema is the
    // table's schema (Delta keeps this in its log — here the footers
    // are merged in a distributed job, bounded by file count). When
    // every footer agrees (un-evolved base under the local-files
    // budget — the CDC-replica case), the schema is served driver-side
    // and the per-merge inference job is skipped (guide §2.4).
    val baseAll =
      graft.lake.Versioned.uniformDirSchemaLocal(spark, baseDir) match {
        case Some(s) => spark.read.schema(s).parquet(baseDir)
        case None => spark.read.option("mergeSchema", "true").parquet(baseDir)
      }
    val res = resolveMerge(baseAll, updates, partitionKeys, rowKey, del)
    val merged = res.merged

    // feed lands before the swap below mutates the base
    changeFeed.foreach { case (dir, batchId) =>
      emitChangeFeed(spark, res, updates, rowKey, del, dir, batchId)
    }

    // The write target IS the read source, which Spark's file-source
    // overwrite check rightly refuses (and an eager cache wouldn't
    // change the plan's file index). So commit the COW way every table
    // format does: write the touched partitions to a staging dir, then
    // swap each touched partition DIRECTORY into the base via rename.
    // Driver-side FS work is bounded by the batch's touched-partition
    // count (collected below) — the merge batch defines it, never the
    // lake size — and rename is a metadata op on HDFS-like stores.
    val staging = new org.apache.hadoop.fs.Path(
      baseDir + "_staging_" + java.util.UUID.randomUUID().toString.take(8))
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try writeMerged(spark, merged, staging.toString, keys = partitionKeys)
    catch { case e: Throwable => fs.delete(staging, true); throw e }
    // From here staging is the only copy of each touched partition once
    // its dst is deleted — so check every rename's boolean (HDFS-style
    // semantics report non-empty-dst/quota failures by returning false,
    // not throwing) and delete staging ONLY after all swaps succeed. A
    // failed swap aborts loudly with the data recoverable in staging.
    res.touchedDirs.foreach { rel =>
      // "" = the UNPARTITIONED table root (resolveMerge's convention):
      // the whole base directory is the one touched "partition"
      val dst = if (rel.isEmpty) new org.apache.hadoop.fs.Path(baseDir)
                else new org.apache.hadoop.fs.Path(baseDir, rel)
      val src = if (rel.isEmpty) staging
                else new org.apache.hadoop.fs.Path(staging, rel)
      fs.delete(dst, true)
      if (fs.exists(src)) { // DELETE-all batch leaves no staging dir
        fs.mkdirs(dst.getParent)
        require(fs.rename(src, dst),
          s"COW commit: rename $src -> $dst failed; partition left recoverable in $staging")
      }
    }
    fs.delete(staging, true)
  }
}
