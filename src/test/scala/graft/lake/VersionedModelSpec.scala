package graft.lake

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.SparkSpec
import graft.ops.MergeData

/** MODEL-BASED protocol spec: a deterministic random sequence of every
  * mutating operation — append, MOR merge (scoped tombstones), COW
  * merge, global equality delete, small-file/zorder optimize,
  * materialize — runs against both the real table and a trivial
  * in-memory map; after EVERY commit the snapshot must equal the
  * model, and at the end a sample of recorded versions must still
  * time-travel to their historical models. This is the test shape
  * that catches interaction bugs no single-scenario spec enumerates:
  * scoped bounds across checkpoint boundaries, tombstones stacking on
  * tombstones, compaction folding half the pending deletes while the
  * other half stays merge-on-read, COW rewrites under mixed-bound
  * carried sets. Seeded, so a failure replays exactly. */
class VersionedModelSpec extends SparkSpec {

  private def state(d: org.apache.spark.sql.DataFrame): Map[(String, Long), Double] =
    d.select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("40 random ops: snapshot == model after every commit; recorded versions time-travel to their historical models") {
    val rnd = new Random(4242L)
    val dir = java.nio.file.Files.createTempDirectory("graft_model")
      .toFile.getAbsolutePath
    val sites = Seq("a", "b", "c")
    var nextId = 100L
    var model = Map.empty[(String, Long), Double]

    // seed
    val seed = sites.zipWithIndex.map { case (s, i) => (s, i.toLong, i * 1.0) }
    MergeData.writeMerged(spark, df(seed, "site", "id", "v"),
      dir, keys = Seq("site"))
    Versioned.init(spark, dir)
    model = seed.map { case (s, i, v) => (s, i) -> v }.toMap
    val history = scala.collection.mutable.Map[Long, Map[(String, Long), Double]](
      0L -> model)

    def freshRows(n: Int): Seq[(String, Long, Double)] =
      (1 to n).map { _ =>
        val s = sites(rnd.nextInt(sites.size))
        val id = { nextId += 1; nextId }
        (s, id, math.rint(rnd.nextDouble() * 100) / 10)
      }
    def existingKeys(n: Int): Seq[(String, Long)] =
      rnd.shuffle(model.keys.toSeq).take(n)

    (1 to 40).foreach { step =>
      val op = rnd.nextInt(10)
      op match {
        case 0 | 1 => // append fresh rows
          val rows = freshRows(1 + rnd.nextInt(3))
          Versioned.append(spark, dir, df(rows, "site", "id", "v"), Seq("site"))
          model ++= rows.map { case (s, i, v) => (s, i) -> v }
        case 2 | 3 | 4 => // MOR merge: updates + inserts + deletes
          // DISJOINT key picks (same-key update+delete in one batch is
          // ambiguous by contract, so the generator never emits it)
          val ks = existingKeys(rnd.nextInt(5))
          val (delK, updK) = ks.splitAt(if (ks.isEmpty) 0 else rnd.nextInt(ks.size + 1))
          val upd = updK.map { case (s, i) =>
            (s, i, math.rint(rnd.nextDouble() * 1000) / 10, false) }
          val ins = freshRows(rnd.nextInt(2) + 1).map { case (s, i, v) =>
            (s, i, v, false) }
          val del = delK.map { case (s, i) => (s, i, 0.0, true) }
          Versioned.mergeIntoMor(spark, dir,
            df(upd ++ ins ++ del, "site", "id", "v", "__delete"),
            Seq("site"), Seq("site", "id"))
          model --= delK
          model ++= (upd ++ ins).map { case (s, i, v, _) => (s, i) -> v }
        case 5 | 6 => // COW merge: same semantics, rewrite path
          val ks = existingKeys(rnd.nextInt(4))
          val (delK, updK) = ks.splitAt(if (ks.isEmpty) 0 else rnd.nextInt(ks.size + 1))
          val upd = updK.map { case (s, i) =>
            (s, i, math.rint(rnd.nextDouble() * 1000) / 10, false) }
          val ins = freshRows(1).map { case (s, i, v) => (s, i, v, false) }
          val del = delK.map { case (s, i) => (s, i, 0.0, true) }
          Versioned.mergeInto(spark, dir,
            df(upd ++ ins ++ del, "site", "id", "v", "__delete"),
            Seq("site"), Seq("site", "id"))
          model --= delK
          model ++= (upd ++ ins).map { case (s, i, v, _) => (s, i) -> v }
        case 7 => // global equality delete by predicate
          val m = 2 + rnd.nextInt(5)
          val hit = model.keys.filter(_._2 % 13 == m).toSet
          if (hit.nonEmpty) {
            Versioned.deleteWhere(spark, dir, col("id") % 13 === m,
              Seq("site", "id"))
            model --= hit
          }
        case 8 => // layout-only maintenance
          if (rnd.nextBoolean())
            Versioned.optimize(spark, dir, Seq("site"),
              targetFilesPerPartition = 2)
          else Versioned.optimize(spark, dir, Seq("site"),
            zorder = Some(col("id")))
        case 9 =>
          Versioned.materializeDeletes(spark, dir, Seq("site"))
      }
      val v = Versioned.currentVersion(spark, dir)
      history(v) = model
      assert(state(Versioned.snapshot(spark, dir)) == model,
        s"divergence after step $step (op $op, version $v)")
    }

    // historical versions still read as their recorded models
    val sample = rnd.shuffle(history.keys.toSeq).take(8)
    sample.foreach { v =>
      assert(state(Versioned.snapshot(spark, dir, v)) == history(v),
        s"version $v must time-travel to its recorded model")
    }
    // and the fold leaves the same final state, metadata-count exact
    Versioned.materializeDeletes(spark, dir, Seq("site"))
    assert(state(Versioned.snapshot(spark, dir)) == model)
    assert(Versioned.fastRowCount(spark, dir) == model.size.toLong)
  }
}
