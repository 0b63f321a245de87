package graft.sources

import scala.util.Random

import graft.{GraftExtensions, SparkSpec}
import graft.lake.Versioned
import graft.ops.MergeData

/** MODEL-BASED spec for the SQL surface: a deterministic random
  * sequence where EVERY mutation is SQL TEXT through the catalog —
  * INSERT INTO, MERGE INTO (randomly routed MOR via the conf), UPDATE,
  * DELETE (COW, and vector-routed under the conf — positional
  * deletion vectors stacking under every later mutation), ALTER TABLE
  * RENAME COLUMN (back and forth, so later SQL speaks the new name),
  * TRUNCATE TABLE — interleaved with SQL maintenance verbs (OPTIMIZE,
  * REORG APPLY (PURGE), ANALYZE [BLOOM] STATISTICS — metadata-only,
  * with coverage inherited by every LATER commit — VACUUM DRY RUN,
  * which may change nothing, and COPY INTO of fresh csv drops whose
  * headers speak the current logical column names), against a trivial
  * in-memory map. After every statement the SQL readback must equal
  * the model, and a sample of versions must time-travel through SQL
  * `VERSION AS OF` under the column name each version carried. This is
  * the interaction net for the round-13 surface: merges over renamed
  * columns, truncate's schema anchor feeding a later merge's target
  * read, MOR tombstones stacking under SQL, updates after truncates.
  * Seeded, so a failure replays exactly. */
class GraftSqlModelSpec extends SparkSpec {

  GraftExtensions.register(spark)
  spark.conf.set("spark.sql.catalog.gmodel", "graft.sources.GraftCatalog")

  test("52 random SQL statements: readback == model after every one; versions travel under their own column names") {
    val rnd = new Random(1313L)
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlmodel")
      .toFile.getAbsolutePath
    val sites = Seq("a", "b", "c")
    var nextId = 100L
    var valCol = "v"
    def tblName = s"gmodel.`$dir`"

    val seed = sites.zipWithIndex.map { case (s, i) => (s, i.toLong, i * 1.0) }
    MergeData.writeMerged(spark, df(seed, "site", "id", "v"),
      dir, keys = Seq("site"))
    Versioned.init(spark, dir)
    var model: Map[(String, Long), Double] =
      seed.map { case (s, i, v) => (s, i) -> v }.toMap
    val history = scala.collection.mutable
      .Map[Long, (Map[(String, Long), Double], String)](0L -> (model, valCol))

    def freshRows(n: Int): Seq[(String, Long, Double)] =
      (1 to n).map { _ =>
        val s = sites(rnd.nextInt(sites.size))
        val id = { nextId += 1; nextId }
        (s, id, math.rint(rnd.nextDouble() * 100) / 10)
      }
    def existingKeys(n: Int): Seq[(String, Long)] =
      rnd.shuffle(model.keys.toSeq).take(n)
    def readState(): Map[(String, Long), Double] =
      spark.sql(s"SELECT site, id, `$valCol` AS v FROM $tblName").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap

    def sqlMaint(text: String): Unit =
      org.apache.spark.sql.GraftColumnBridge.ofRows(spark,
        GraftSqlParser.parseMaintenance(spark, text).get).collect()

    var copySeq = 0
    val dropRoot = java.nio.file.Files
      .createTempDirectory("graft_sqlmodel_drops").toFile.getAbsolutePath
    (1 to 52).foreach { step =>
      val op = rnd.nextInt(16)
      op match {
        case 0 | 1 => // SQL INSERT INTO ... VALUES
          val rows = freshRows(1 + rnd.nextInt(3))
          val values = rows
            .map { case (s, i, v) => s"($i, ${v}D, '$s')" }.mkString(", ")
          spark.sql(s"INSERT INTO $tblName VALUES $values")
          model ++= rows.map { case (s, i, v) => (s, i) -> v }
        case 2 | 3 | 4 => // SQL MERGE (randomly MOR-routed)
          val ks = existingKeys(rnd.nextInt(5))
          val (delK, updK) =
            ks.splitAt(if (ks.isEmpty) 0 else rnd.nextInt(ks.size + 1))
          val upd = updK.map { case (s, i) =>
            (s, i, math.rint(rnd.nextDouble() * 1000) / 10, false) }
          val ins = freshRows(1 + rnd.nextInt(2))
            .map { case (s, i, v) => (s, i, v, false) }
          val del = delK.map { case (s, i) => (s, i, 0.0, true) }
          df(upd ++ ins ++ del, "site", "id", valCol, "del")
            .createOrReplaceTempView("gmodel_src")
          val mor = rnd.nextBoolean()
          if (mor) spark.conf.set("spark.graft.sql.merge.mor", "true")
          try spark.sql(
            s"""MERGE INTO $tblName t USING gmodel_src s
               |ON t.site = s.site AND t.id = s.id
               |WHEN MATCHED AND s.del THEN DELETE
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED AND NOT s.del THEN INSERT *""".stripMargin)
          finally if (mor) spark.conf.unset("spark.graft.sql.merge.mor")
          model --= delK
          model ++= (upd ++ ins).map { case (s, i, v, _) => (s, i) -> v }
        case 5 | 6 => // SQL UPDATE, absolute assignment
          val m = rnd.nextInt(7)
          val nv = math.rint(rnd.nextDouble() * 1000) / 10
          spark.sql(
            s"UPDATE $tblName SET `$valCol` = ${nv}D WHERE id % 7 = $m")
          model = model.map { case (k @ (_, i), v0) =>
            k -> (if (i % 7 == m) nv else v0) }
        case 7 => // SQL DELETE (COW)
          val m = rnd.nextInt(13)
          spark.sql(s"DELETE FROM $tblName WHERE id % 13 = $m")
          model = model.filter { case ((_, i), _) => i % 13 != m }
        case 8 => // ALTER RENAME the value column, back and forth
          val next = if (valCol == "v") "reading" else "v"
          spark.sql(
            s"ALTER TABLE $tblName RENAME COLUMN `$valCol` TO `$next`")
          valCol = next
        case 9 => // SQL OPTIMIZE interleaves, layout-only
          sqlMaint(s"OPTIMIZE $tblName")
        case 10 => // SQL TRUNCATE
          spark.sql(s"TRUNCATE TABLE $tblName")
          model = Map.empty
        case 11 => // SQL REORG APPLY (PURGE): folds tombstones + DVs
          sqlMaint(s"REORG TABLE $tblName APPLY (PURGE)")
        case 12 => // SQL DELETE routed to POSITIONAL DELETION VECTORS
          val cut = rnd.nextInt(1000) / 10.0 + 0.05
          spark.conf.set("spark.graft.sql.delete.vectors", "true")
          try spark.sql(
            s"DELETE FROM $tblName WHERE `$valCol` > ${cut}D")
          finally spark.conf.unset("spark.graft.sql.delete.vectors")
          model = model.filter { case (_, v) => !(v > cut) }
        case 13 => // SQL ANALYZE: metadata-only bootstrap/re-column of
          // the stats or bloom discipline — the model never moves, and
          // every LATER commit (merges, optimizes, vector deletes,
          // truncates) must keep the inherited coverage consistent
          if (Versioned.filesAt(spark, dir).nonEmpty) {
            if (rnd.nextBoolean())
              sqlMaint(s"ANALYZE TABLE $tblName COMPUTE STATISTICS " +
                s"FOR COLUMNS (id, `$valCol`)")
            else
              sqlMaint(s"ANALYZE TABLE $tblName COMPUTE BLOOM STATISTICS " +
                "FOR COLUMNS (id) EXPECTED 1000 ITEMS FPP 0.02")
          }
        case 14 => // VACUUM DRY RUN: read-only — nothing may change
          sqlMaint(s"VACUUM $tblName RETAIN 0 HOURS DRY RUN")
        case 15 => // SQL COPY INTO a fresh csv drop: appends like INSERT,
          // headers speak the CURRENT logical column name
          val rows = freshRows(1 + rnd.nextInt(3))
          copySeq += 1
          val drop = s"$dropRoot/drops_$copySeq"
          df(rows, "site", "id", valCol).coalesce(1)
            .write.option("header", "true").csv(drop)
          sqlMaint(s"COPY INTO $tblName FROM '$drop' FILEFORMAT = CSV " +
            "FORMAT_OPTIONS ('header' = 'true')")
          model ++= rows.map { case (s, i, v) => (s, i) -> v }
      }
      val ver = Versioned.currentVersion(spark, dir)
      history(ver) = (model, valCol)
      val cols = Versioned.snapshot(spark, dir).columns.toSeq
      assert(cols.contains(valCol),
        s"step $step op $op: tracked column '$valCol' not in $cols")
      assert(readState() == model,
        s"divergence after step $step (op $op, version $ver)")
    }

    // SQL time travel, each version under ITS OWN column name
    rnd.shuffle(history.keys.toSeq).take(8).foreach { ver =>
      val (m, c) = history(ver)
      val got = spark.sql(
        s"SELECT site, id, `$c` AS v FROM $tblName VERSION AS OF $ver")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      assert(got == m, s"version $ver must travel under column '$c'")
    }
  }
}
