package graft.lake

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.MergeData

/** REAL thread races — the hook-injected specs pin deterministic
  * interleavings; this one lets the scheduler pick them: N writer
  * threads hammer one table through the public retrying entry points
  * and every row must land exactly once, every version resolve, and
  * no data file end up unreferenced-but-needed. Run under BOTH commit
  * owners: the rename CAS and the put-if-absent reservation must
  * arbitrate identically under genuine contention. */
class ConcurrencyStressSpec extends SparkSpec {

  private def freshLake(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stress").toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("b", 2L, 2.0)), "site", "id", "v"),
      dir.getAbsolutePath, keys = Seq("site"))
    dir.getAbsolutePath
  }

  for ((name, owner) <- Seq(
    "rename" -> Versioned.RenameCommitOwner,
    "conditional-put" -> Versioned.MemoryConditionalPutOwner)) {

    test(s"[$name] 6 threads x 4 appends race: every row lands exactly once, every version resolves") {
      val prev = Versioned.commitOwner
      Versioned.MemoryConditionalPutOwner.reset()
      Versioned.commitOwner = owner
      try {
        val dir = freshLake()
        Versioned.init(spark, dir)
        val pool = Executors.newFixedThreadPool(6)
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutor(pool)
        val writers = (0 until 6).map { w =>
          Future {
            (0 until 4).foreach { i =>
              val id = 100L + w * 10 + i
              // generous attempts: 24 committers can pile up on one CAS
              Versioned.append(spark, dir,
                df(Seq(("a", id, id.toDouble)), "site", "id", "v"),
                Seq("site"), maxAttempts = 60)
            }
          }
        }
        try Await.result(Future.sequence(writers), 600.seconds)
        finally pool.shutdown()
        val cur = Versioned.currentVersion(spark, dir)
        assert(cur == 24L, s"24 appends on v0 must land as v1..v24, got $cur")
        // exactly-once content
        val got = Versioned.snapshot(spark, dir)
          .select("id").collect().map(_.getLong(0)).sorted.toSeq
        val want = (Seq(1L, 2L) ++
          (for (w <- 0 until 6; i <- 0 until 4) yield 100L + w * 10 + i)).sorted
        assert(got == want, "every append's row exactly once")
        // every retained version resolves and is monotone in size
        val sizes = (0L to cur).map(v => Versioned.filesAt(spark, dir, v).size)
        assert(sizes == sizes.sorted, "appends only ever add files")
        // no unreferenced data files (appends never supersede)
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
        var phys = 0
        while (it.hasNext) {
          val p = it.next().getPath
          if (p.getName.endsWith(".parquet") && !p.toString.contains("/_"))
            phys += 1
        }
        assert(phys == Versioned.filesAt(spark, dir, cur).size,
          "no append attempt may orphan data files on a lost CAS " +
            "(commit-only retry reuses the written files)")
      } finally Versioned.commitOwner = prev
    }

    test(s"[$name] 4 threads race disjoint-partition merges: all land, content exact") {
      val prev = Versioned.commitOwner
      Versioned.MemoryConditionalPutOwner.reset()
      Versioned.commitOwner = owner
      try {
        val dir = java.nio.file.Files.createTempDirectory("graft_stressm")
          .toFile.getAbsolutePath
        val sites = Seq("a", "b", "c", "d")
        MergeData.writeMerged(spark,
          df(sites.zipWithIndex.map { case (s, i) => (s, i.toLong, 1.0) },
            "site", "id", "v"), dir, keys = Seq("site"))
        Versioned.init(spark, dir)
        val pool = Executors.newFixedThreadPool(4)
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutor(pool)
        val writers = sites.zipWithIndex.map { case (s, i) =>
          Future {
            Versioned.mergeIntoRetry(spark, dir,
              df(Seq((s, i.toLong, 100.0 + i, false)),
                "site", "id", "v", "__delete"),
              Seq("site"), Seq("site", "id"), maxAttempts = 30)
          }
        }
        try Await.result(Future.sequence(writers), 600.seconds)
        finally pool.shutdown()
        assert(Versioned.currentVersion(spark, dir) == 4L,
          "four merges must land as v1..v4")
        val got = Versioned.snapshot(spark, dir)
          .select("site", "v").collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(got == sites.zipWithIndex
          .map { case (s, i) => s -> (100.0 + i) }.toMap,
          "each writer's partition carries exactly its own update")
      } finally Versioned.commitOwner = prev
    }
  }
}
