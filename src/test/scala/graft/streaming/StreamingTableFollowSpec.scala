package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.lake.Versioned
import graft.ops.MergeData

/** Streaming FROM a versioned table: initial snapshot + append-only
  * version ranges, exactly-once into a txn-marked versioned sink
  * across restarts and a lost high-water mark; rewrites refused. */
class StreamingTableFollowSpec extends SparkSpec {

  private def state(d: org.apache.spark.sql.DataFrame): Set[(String, Long, Double)] =
    d.select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("followed sink == source across append waves; initial snapshot served; replay-safe; rewrites refused") {
    val root = java.nio.file.Files.createTempDirectory("graft_follow").toFile
    root.deleteOnExit()
    val src = new java.io.File(root, "src").getAbsolutePath
    val sink = new java.io.File(root, "sink").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath

    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("b", 10L, 10.0)), "site", "id", "v"),
      src, keys = Seq("site"))
    Versioned.init(spark, src)
    Versioned.append(spark, src,
      df(Seq(("a", 2L, 2.0), ("b", 11L, 11.0)), "site", "id", "v"),
      Seq("site"))

    // the sink applies each served range with a (txn, toV) marker —
    // the exactly-once discipline the follower's at-least-once needs
    val process = (d: org.apache.spark.sql.DataFrame, _: Long, toV: Long) =>
      { Versioned.append(spark, sink, d, Seq("site"),
          txn = Some(("follow", toV))); () }

    StreamingTableFollow.start(spark, src, ckpt, process).awaitTermination()
    assert(state(Versioned.snapshot(spark, sink)) ==
      state(Versioned.snapshot(spark, src)),
      "initial snapshot + first append wave must be served")
    // v0 snapshot batch + v0..v1 appends batch = two sink commits
    val sinkV1 = Versioned.currentVersion(spark, sink)

    // second wave lands after the first run finished; a restarted
    // follower with the same checkpoint picks up only the new range
    Versioned.append(spark, src,
      df(Seq(("a", 3L, 3.0)), "site", "id", "v"), Seq("site"))
    StreamingTableFollow.start(spark, src, ckpt, process).awaitTermination()
    assert(state(Versioned.snapshot(spark, sink)) ==
      state(Versioned.snapshot(spark, src)))
    assert(Versioned.currentVersion(spark, sink) == sinkV1 + 1,
      "one sink commit per served range")

    // lost high-water mark (crash between process and mark write):
    // the follower re-serves, the sink's txn markers skip — no dupes,
    // no version advance
    val fs = new org.apache.hadoop.fs.Path(ckpt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ckpt, "table_follow_hw"), false)
    val reserved = StreamingTableFollow.followOnce(spark, src, ckpt, process)
    assert(reserved.isDefined, "a re-serve must have happened")
    assert(state(Versioned.snapshot(spark, sink)) ==
      state(Versioned.snapshot(spark, src)))
    assert(Versioned.currentVersion(spark, sink) == sinkV1 + 1,
      "replayed ranges must not advance the sink")

    // idle follower: nothing to serve
    assert(StreamingTableFollow.followOnce(spark, src, ckpt, process).isEmpty)

    // a REWRITE commit poisons the append-only contract: the follower
    // refuses and names the alternative
    Versioned.mergeInto(spark, src,
      df(Seq(("a", 1L, 99.0, false)), "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"))
    val e = intercept[IllegalArgumentException] {
      StreamingTableFollow.followOnce(spark, src, ckpt, process)
    }
    assert(e.getMessage.contains("change feed"))
  }

  test("a crash between process and the mark write re-serves the PINNED range even after new appends land") {
    val root = java.nio.file.Files.createTempDirectory("graft_follow_pin").toFile
    root.deleteOnExit()
    val src = new java.io.File(root, "src").getAbsolutePath
    val sink = new java.io.File(root, "sink").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0)), "site", "id", "v"), src, keys = Seq("site"))
    Versioned.init(spark, src)
    val process = (d: org.apache.spark.sql.DataFrame, _: Long, toV: Long) =>
      { Versioned.append(spark, sink, d, Seq("site"),
          txn = Some(("follow", toV))); () }
    // consume the initial snapshot
    StreamingTableFollow.followOnce(spark, src, ckpt, process)
    val sinkV0 = Versioned.currentVersion(spark, sink)

    Versioned.append(spark, src,
      df(Seq(("a", 2L, 2.0)), "site", "id", "v"), Seq("site"))
    // the process COMMITS, then the follower crashes before its mark
    // write — the classic at-least-once window
    val boom = new RuntimeException("crash after process")
    intercept[RuntimeException] {
      StreamingTableFollow.followOnce(spark, src, ckpt,
        (d, f, t) => { process(d, f, t); throw boom })
    }
    // NEW appends land before the restart
    Versioned.append(spark, src,
      df(Seq(("a", 3L, 3.0)), "site", "id", "v"), Seq("site"))
    // the restarted follower must FIRST re-serve the identical pinned
    // range (the sink's txn marker dedups it), not a recomputed wider
    // one whose fresh marker would commit the prefix twice
    val r1 = StreamingTableFollow.followOnce(spark, src, ckpt, process)
    assert(r1.contains((0L, 1L)), s"pinned range must replay verbatim, got $r1")
    val r2 = StreamingTableFollow.followOnce(spark, src, ckpt, process)
    assert(r2.contains((1L, 2L)))
    assert(state(Versioned.snapshot(spark, sink)) ==
      state(Versioned.snapshot(spark, src)))
    assert(Versioned.currentVersion(spark, sink) == sinkV0 + 2,
      "exactly one sink commit per distinct range — no duplicate for the replay")
  }

  test("a fresh checkpoint starts from the CURRENT snapshot — even after vacuum reaped v0 and optimize rewrote files") {
    val root = java.nio.file.Files.createTempDirectory("graft_follow_cur").toFile
    root.deleteOnExit()
    val src = new java.io.File(root, "src").getAbsolutePath
    val sink = new java.io.File(root, "sink").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0)), "site", "id", "v"), src, keys = Seq("site"))
    Versioned.init(spark, src)
    (2 to 4).foreach { i =>
      Versioned.append(spark, src,
        df(Seq(("a", i.toLong, i.toDouble)), "site", "id", "v"), Seq("site"))
    }
    Versioned.optimize(spark, src, Seq("site")) // rewrites every file
    Versioned.vacuum(spark, src, keepVersions = 1) // v0 is GONE
    val served = StreamingTableFollow.followOnce(spark, src, ckpt,
      (d, _, toV) => { Versioned.append(spark, sink, d, Seq("site"),
        txn = Some(("follow", toV))); () })
    assert(served.isDefined)
    assert(state(Versioned.snapshot(spark, sink)) ==
      state(Versioned.snapshot(spark, src)))
  }

  test("unified change stream follows an append -> merge -> append -> delete -> restore history exactly-once across a crash") {
    val root = java.nio.file.Files.createTempDirectory("graft_follow_uni").toFile
    root.deleteOnExit()
    val src = new java.io.File(root, "src").getAbsolutePath
    val sink = new java.io.File(root, "sink").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("b", 10L, 10.0)), "site", "id", "v"),
      src, keys = Seq("site"))
    Versioned.init(spark, src)                                   // v0
    Versioned.enableChangeFeed(spark, src, Seq("site", "id"))    // v1

    // change-row sink: insert-only batches append, mixed batches merge;
    // both stamp txn = (id, range toV) — the exactly-once discipline
    def applyChanges(d: org.apache.spark.sql.DataFrame, toV: Long): Unit = {
      val b = d.filter(col("_action") =!= "update_preimage")
        .withColumn("__delete", col("_action") === "delete")
        .drop("_action")
      if (!b.isEmpty) {
        if (Versioned.currentVersion(spark, sink) < 0)
          Versioned.append(spark, sink, b.drop("__delete"), Seq("site"),
            txn = Some(("cf", toV)))
        else
          Versioned.mergeInto(spark, sink, b, Seq("site"), Seq("site", "id"),
            txn = Some(("cf", toV)))
      }
    }
    // consume the initial snapshot, then build the mixed history
    StreamingTableFollow.followChangesOnce(spark, src, ckpt,
      (d, _, toV) => applyChanges(d, toV))
    Versioned.append(spark, src,
      df(Seq(("a", 2L, 2.0)), "site", "id", "v"), Seq("site"))   // v2
    Versioned.mergeInto(spark, src,
      df(Seq(("a", 1L, 100.0, false), ("b", 10L, 0.0, true)),
        "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"))                            // v3 rewrite
    Versioned.append(spark, src,
      df(Seq(("b", 11L, 11.0)), "site", "id", "v"), Seq("site")) // v4
    Versioned.deleteWhere(spark, src, col("id") === 2L,
      keyCols = Seq("site", "id"))                               // v5 MOR
    Versioned.restore(spark, src, 2L)                            // v6

    // crash after the FIRST served range commits — mid-catchup
    val boom = new RuntimeException("crash mid-catchup")
    intercept[RuntimeException] {
      StreamingTableFollow.followChangesOnce(spark, src, ckpt,
        (d, _, toV) => { applyChanges(d, toV); throw boom })
    }
    // restart: replays the identical plan; txn markers dedup the
    // already-committed prefix, then the rest of the history applies
    val served = StreamingTableFollow.followChangesOnce(spark, src, ckpt,
      (d, _, toV) => applyChanges(d, toV))
    assert(served.size >= 4,
      s"append run, merge, append run, delete, restore each serve: $served")
    assert(state(Versioned.snapshot(spark, sink)) ==
      state(Versioned.snapshot(spark, src)),
      "replica must converge across merge/delete/restore commits")
    assert(state(Versioned.snapshot(spark, sink)) ==
      Set(("a", 1L, 1.0), ("b", 10L, 10.0), ("a", 2L, 2.0)),
      "restored state: v2's rows")

    // further waves stream incrementally (one wakeup each)
    Versioned.append(spark, src,
      df(Seq(("c", 20L, 20.0)), "site", "id", "v"), Seq("site"))
    Versioned.deleteWhere(spark, src, col("id") === 1L,
      keyCols = Seq("site", "id"))
    StreamingTableFollow.followChangesOnce(spark, src, ckpt,
      (d, _, toV) => applyChanges(d, toV))
    assert(state(Versioned.snapshot(spark, sink)) ==
      state(Versioned.snapshot(spark, src)))
    // idle
    assert(StreamingTableFollow.followChangesOnce(spark, src, ckpt,
      (d, _, toV) => applyChanges(d, toV)).isEmpty)
  }

  test("maxVersionsPerTrigger: a 10-commit backlog drains in ceil(10/k) bounded deliveries; crash replays its chunk identically; no dup/loss") {
    val root = java.nio.file.Files.createTempDirectory("graft_chunk").toFile
    root.deleteOnExit()
    val src = new java.io.File(root, "src").getAbsolutePath
    val sink = new java.io.File(root, "sink").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("b", 10L, 10.0)), "site", "id", "v"),
      src, keys = Seq("site"))
    Versioned.init(spark, src)                                   // v0
    Versioned.enableChangeFeed(spark, src, Seq("site", "id"))    // v1
    def applyChanges(d: org.apache.spark.sql.DataFrame, toV: Long): Unit = {
      val b = d.filter(col("_action") =!= "update_preimage")
        .withColumn("__delete", col("_action") === "delete")
        .drop("_action")
      if (!b.isEmpty) {
        if (Versioned.currentVersion(spark, sink) < 0)
          Versioned.append(spark, sink, b.drop("__delete"), Seq("site"),
            txn = Some(("chunk", toV)))
        else
          Versioned.mergeInto(spark, sink, b, Seq("site"), Seq("site", "id"),
            txn = Some(("chunk", toV)))
      }
    }
    // consume the initial snapshot (unchunked by design), then build
    // a 10-commit backlog: 8 appends + 2 merges scattered in
    StreamingTableFollow.followChangesOnce(spark, src, ckpt,
      (d, _, toV) => applyChanges(d, toV))
    (1 to 4).foreach { i =>
      Versioned.append(spark, src,
        df(Seq(("a", 100L + i, i.toDouble)), "site", "id", "v"), Seq("site"))
    }
    Versioned.mergeInto(spark, src,
      df(Seq(("a", 1L, 111.0, false)), "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"))
    (5 to 8).foreach { i =>
      Versioned.append(spark, src,
        df(Seq(("b", 100L + i, i.toDouble)), "site", "id", "v"), Seq("site"))
    }
    Versioned.mergeInto(spark, src,
      df(Seq(("b", 10L, 0.0, true)), "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"))
    assert(Versioned.currentVersion(spark, src) == 11L) // backlog (1, 11]
    // drain with k=3: deliveries (pinned chunks) = ceil(10/3) = 4,
    // each spanning at most 3 versions. Crash INSIDE delivery 2 after
    // its sink commits; the restart must replay the IDENTICAL chunk
    // (txn markers dedup) and keep draining.
    val k = 3L
    var deliveries = 0
    var crashed = false
    var done = false
    while (!done) {
      val served = StreamingTableFollow.followChangesOnce(spark, src, ckpt,
        (d, _, toV) => applyChanges(d, toV), maxVersionsPerTrigger = k)
      if (served.isEmpty) done = true
      else {
        deliveries += 1
        assert(served.map(_._2).max - served.map(_._1).min <= k,
          s"a delivery must span at most $k versions, got $served")
      }
      // inject ONE crash mid-chunk after delivery 1: the partially
      // applied chunk stays pinned, and the next loop turn must
      // replay it as ONE delivery (txn markers dedup the applied
      // prefix) — not split, not widen
      if (deliveries == 1 && !crashed) {
        crashed = true
        val boom = new RuntimeException("crash mid-chunk")
        val thrown = intercept[RuntimeException] {
          StreamingTableFollow.followChangesOnce(spark, src, ckpt,
            (d, _, toV) => { applyChanges(d, toV); throw boom },
            maxVersionsPerTrigger = k)
        }
        assert(thrown eq boom)
      }
    }
    assert(crashed, "the crash leg must have run")
    assert(deliveries == 4,
      s"ceil(10/$k) = 4 bounded deliveries must drain the backlog " +
        s"(the crashed chunk replays as ONE of them), got $deliveries")
    assert(state(Versioned.snapshot(spark, sink)) ==
      state(Versioned.snapshot(spark, src)),
      "no dup, no loss: the chunked, crashed-and-replayed follower converges")
  }

  test("append refuses key collisions with pending tombstones; appendsBetween refuses tombstone changes") {
    val root = java.nio.file.Files.createTempDirectory("graft_follow2").toFile
    root.deleteOnExit()
    val lake = new java.io.File(root, "lake").getAbsolutePath
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0)), "site", "id", "v"),
      lake, keys = Seq("site"))
    Versioned.init(spark, lake)
    Versioned.deleteWhere(spark, lake, col("id") === 1L, keyCols = Seq("id"))
    // colliding key refused; disjoint append is fine
    val e = intercept[IllegalArgumentException] {
      Versioned.append(spark, lake,
        df(Seq(("a", 1L, 5.0)), "site", "id", "v"), Seq("site"))
    }
    assert(e.getMessage.contains("mergeInto"))
    Versioned.append(spark, lake,
      df(Seq(("a", 3L, 3.0)), "site", "id", "v"), Seq("site"))
    assert(state(Versioned.snapshot(spark, lake)) ==
      Set(("a", 2L, 2.0), ("a", 3L, 3.0)))
    // the deleteWhere commit changed visible rows without touching
    // files — a follower range across it must refuse
    val e2 = intercept[IllegalArgumentException] {
      Versioned.appendsBetween(spark, lake, 0L, 2L)
    }
    assert(e2.getMessage.contains("change feed"))
    // while the pure-append tail reads exactly the appended rows
    assert(state(Versioned.appendsBetween(spark, lake, 1L, 2L)) ==
      Set(("a", 3L, 3.0)))
  }

  test("unified stream across a RENAME: each batch speaks its own range-end's names (the documented contract)") {
    val root = java.nio.file.Files.createTempDirectory("graft_follow3").toFile
    root.deleteOnExit()
    val src = new java.io.File(root, "src").getAbsolutePath
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("b", 10L, 10.0)), "site", "id", "v"),
      src, keys = Seq("site"))
    Versioned.init(spark, src)                                      // v0
    Versioned.enableChangeFeed(spark, src, Seq("site", "id"))       // v1
    val served = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[String])]
    def record(d: org.apache.spark.sql.DataFrame, toV: Long): Unit =
      served += ((toV, d.columns.toSet - "_action"))
    // initial snapshot (pre-rename names)
    StreamingTableFollow.followChangesOnce(spark, src, ckpt,
      (d, _, toV) => record(d, toV))
    Versioned.mergeInto(spark, src,
      df(Seq(("a", 1L, 100.0, false)), "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"))                               // v2
    Versioned.renameColumn(spark, src, "v", "val")                  // v3
    Versioned.append(spark, src,
      df(Seq(("b", 11L, 11.0)), "site", "id", "val"), Seq("site"))  // v4
    StreamingTableFollow.followChangesOnce(spark, src, ckpt,
      (d, _, toV) => record(d, toV))
    // the v2 increment speaks ITS commit's name ('v'); the append run
    // ending at v4 — which absorbed the rename, a metadata commit —
    // speaks the NEW name: the schema changes exactly at the commit
    // that changed it (the documented follower contract)
    assert(served.toList.map { case (toV, cols) =>
      (toV, cols.contains("v"), cols.contains("val")) } ==
      List((1L, true, false), (2L, true, false), (4L, false, true)),
      s"got $served")
  }
}
