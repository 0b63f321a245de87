package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.MergeData

/** The protocol's one atomicity assumption, made explicit and proved
  * swappable: every concurrency behavior the suite pins — append's
  * commit-only retry, the disjoint-merge rebase, OPTIMIZE's rebase,
  * the MOR merge's full re-resolve, and the bare version CAS — must
  * hold identically under the rename owner (HDFS semantics) and under
  * a put-if-absent owner (S3/GCS conditional-put semantics, no atomic
  * rename anywhere). If this matrix is green, porting the engine to
  * an object store is an owner implementation, not a protocol
  * redesign. */
class CommitOwnerSpec extends SparkSpec {

  private def state(d: org.apache.spark.sql.DataFrame): Set[(String, Long, Double)] =
    d.select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private def freshLake(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_owner").toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0)),
        "site", "id", "v"),
      dir.getAbsolutePath, keys = Seq("site"))
    dir.getAbsolutePath
  }

  private def underOwner(owner: Versioned.CommitOwner)(body: => Unit): Unit = {
    val prev = Versioned.commitOwner
    Versioned.MemoryConditionalPutOwner.reset()
    Versioned.commitOwner = owner
    try body finally Versioned.commitOwner = prev
  }

  private val owners = Seq(
    "rename" -> Versioned.RenameCommitOwner,
    "conditional-put" -> Versioned.MemoryConditionalPutOwner)

  for ((name, owner) <- owners) {

    test(s"[$name] bare version CAS: second committer of a version is refused, first wins intact") {
      underOwner(owner) {
        val dir = freshLake()
        Versioned.init(spark, dir)
        val files = Versioned.filesAt(spark, dir)
        Versioned.commitManifest(spark, dir, 1L, files)
        val e = intercept[IllegalArgumentException] {
          Versioned.commitManifest(spark, dir, 1L, files.take(1))
        }
        assert(e.getMessage.contains("concurrent commit"))
        assert(Versioned.filesAt(spark, dir, 1L) == files.sorted,
          "the winner's manifest must be untouched by the loser's attempt")
      }
    }

    test(s"[$name] append race: the loser lands commit-only; both rows visible; no orphans") {
      underOwner(owner) {
        val dir = freshLake()
        Versioned.init(spark, dir)
        var fired = false
        Versioned.beforeCommitHook = () => {
          if (!fired) { fired = true
            Versioned.append(spark, dir,
              df(Seq(("b", 20L, 20.0)), "site", "id", "v"), Seq("site")) }
        }
        val vA =
          try Versioned.append(spark, dir,
            df(Seq(("a", 30L, 30.0)), "site", "id", "v"), Seq("site"))
          finally Versioned.beforeCommitHook = () => ()
        assert(vA == 2L)
        assert(state(Versioned.snapshot(spark, dir)) ==
          Set(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0),
            ("b", 20L, 20.0), ("a", 30L, 30.0)))
      }
    }

    test(s"[$name] disjoint merge race: the loser rebases commit-only; both merges land") {
      underOwner(owner) {
        val dir = freshLake()
        Versioned.init(spark, dir)
        var fired = false
        Versioned.beforeCommitHook = () => {
          if (!fired) { fired = true
            Versioned.mergeInto(spark, dir,
              df(Seq(("b", 10L, 222.0, false)), "site", "id", "v", "__delete"),
              Seq("site"), Seq("site", "id")) }
        }
        val vA =
          try Versioned.mergeInto(spark, dir,
            df(Seq(("a", 1L, 111.0, false)), "site", "id", "v", "__delete"),
            Seq("site"), Seq("site", "id"))
          finally Versioned.beforeCommitHook = () => ()
        assert(vA == 2L)
        assert(state(Versioned.snapshot(spark, dir)) == Set(
          ("a", 1L, 111.0), ("a", 2L, 2.0), ("b", 10L, 222.0)))
      }
    }

    test(s"[$name] OPTIMIZE race vs append: rebases; vs overlapping rewrite: aborts") {
      underOwner(owner) {
        val dir = freshLake()
        Versioned.init(spark, dir)
        (1 to 2).foreach { i =>
          Versioned.append(spark, dir,
            df(Seq(("a", 100L + i, i.toDouble)), "site", "id", "v"), Seq("site"))
        }
        var fired = false
        Versioned.beforeCommitHook = () => {
          if (!fired) { fired = true
            Versioned.append(spark, dir,
              df(Seq(("b", 777L, 77.0)), "site", "id", "v"), Seq("site")) }
        }
        val vOpt =
          try Versioned.optimize(spark, dir, Seq("site"))
          finally Versioned.beforeCommitHook = () => ()
        assert(state(Versioned.snapshot(spark, dir, vOpt))
          .contains(("b", 777L, 77.0)))
        assert(Versioned.filesAt(spark, dir, vOpt)
          .count(_.contains("site=a/")) == 1)
      }
    }

    test(s"[$name] MOR merge race: the loser re-resolves fully and lands; upsert chain intact") {
      underOwner(owner) {
        val dir = freshLake()
        Versioned.init(spark, dir)
        var fired = false
        Versioned.beforeCommitHook = () => {
          if (!fired) { fired = true
            Versioned.mergeIntoMor(spark, dir,
              df(Seq(("b", 10L, 200.0, false)), "site", "id", "v", "__delete"),
              Seq("site"), Seq("site", "id")) }
        }
        val vA =
          try Versioned.mergeIntoMor(spark, dir,
            df(Seq(("a", 1L, 100.0, false)), "site", "id", "v", "__delete"),
            Seq("site"), Seq("site", "id"))
          finally Versioned.beforeCommitHook = () => ()
        assert(vA == 2L)
        assert(state(Versioned.snapshot(spark, dir)) == Set(
          ("a", 1L, 100.0), ("a", 2L, 2.0), ("b", 10L, 200.0)))
      }
    }

    test(s"[$name] reader holding version N is isolated from a concurrent commit") {
      underOwner(owner) {
        val dir = freshLake()
        Versioned.init(spark, dir)
        val snapV0 = Versioned.snapshot(spark, dir, 0L)
        Versioned.mergeInto(spark, dir,
          df(Seq(("a", 1L, 999.0, false)), "site", "id", "v", "__delete"),
          Seq("site"), Seq("site", "id"))
        assert(state(snapV0) == Set(("a", 1L, 1.0), ("a", 2L, 2.0),
          ("b", 10L, 10.0)), "a pinned version never sees later commits")
      }
    }
  }
}
