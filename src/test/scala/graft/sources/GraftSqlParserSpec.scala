package graft.sources

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, Row}
import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkSpec}
import graft.lake.Versioned
import graft.ops.MergeData

/** The SQL maintenance verbs ([[GraftSqlParser]]): OPTIMIZE [ZORDER
  * BY], VACUUM [RETAIN], RESTORE TO VERSION/TIMESTAMP AS OF, CREATE
  * TABLE ... SHALLOW CLONE, REORG TABLE ... APPLY (PURGE) — parsed by
  * the injected parser and lowered onto the Versioned maintenance
  * core, each returning its metrics as rows. The shared test session
  * was built without the extensions hook (a parser cannot be swapped
  * on a live session), so statements parse through a directly-
  * instantiated parser and execute through the normal command path —
  * the exact plan `spark.sql` would run under
  * `spark.sql.extensions=graft.GraftExtensions` (q206 drives that end
  * to end under Verify's extension-built session). */
class GraftSqlParserSpec extends SparkSpec {

  GraftExtensions.register(spark)
  spark.conf.set("spark.sql.catalog.graft_mnt", "graft.sources.GraftCatalog")

  /** Parse a maintenance statement and execute its command plan. */
  private def sqlM(text: String): DataFrame =
    GraftColumnBridge.ofRows(spark,
      GraftSqlParser.parseMaintenance(spark, text).getOrElse(
        throw new IllegalArgumentException(s"parser did not claim: $text")))

  private def state(d: DataFrame): Set[(String, Long, Double)] =
    d.select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private def freshLake(nAppends: Int = 3): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mnt").toFile
    dir.deleteOnExit()
    val lake = new java.io.File(dir, "lake").getAbsolutePath
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("b", 10L, 10.0)), "site", "id", "v"),
      lake, keys = Seq("site"))
    Versioned.init(spark, lake, commitTs = 1000L)
    (1 to nAppends).foreach { i =>
      Versioned.append(spark, lake,
        df(Seq(("a", 100L + i, i.toDouble)), "site", "id", "v"),
        Seq("site"), commitTs = 1000L + i)
    }
    lake
  }

  private def tbl(dir: String) = s"graft_mnt.`$dir`"

  test("OPTIMIZE: compacts small files into one per partition, reports file counts, data identical; ZORDER BY variants parse and run") {
    val dir = freshLake()
    val before = state(Versioned.snapshot(spark, dir))
    val m = sqlM(s"OPTIMIZE ${tbl(dir)}").collect().head
    assert(m.getLong(1) > m.getLong(2),
      s"optimize must report fewer files after (got $m)")
    assert(Versioned.filesAt(spark, dir).size == m.getLong(2).toInt)
    assert(state(Versioned.snapshot(spark, dir)) == before)
    // single-column ZORDER (any orderable type)
    Versioned.append(spark, dir,
      df(Seq(("a", 200L, 9.0)), "site", "id", "v"), Seq("site"))
    sqlM(s"OPTIMIZE ${tbl(dir)} ZORDER BY (id)")
    assert(state(Versioned.snapshot(spark, dir)) == before + (("a", 200L, 9.0)))
    // two-column ZORDER: morton interleave of integral columns
    val dir2 = java.nio.file.Files.createTempDirectory("graft_mntz")
      .toFile.getAbsolutePath + "/lake"
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 2L), ("a", 2L, 1L), ("b", 3L, 3L)), "site", "x", "y"),
      dir2, keys = Seq("site"))
    Versioned.init(spark, dir2)
    sqlM(s"OPTIMIZE graft_mnt.`$dir2` ZORDER BY (x, y)")
    assert(Versioned.snapshot(spark, dir2).count() == 3L)
    // >2 columns refuse with guidance
    val e = intercept[Exception] {
      sqlM(s"OPTIMIZE graft_mnt.`$dir2` ZORDER BY (x, y, site)") }
    assert(e.getMessage.contains("1 or 2 columns"), e.getMessage)
  }

  test("VACUUM [RETAIN n HOURS]: reaps to the retention cutoff, keeps the current version; reports kept count") {
    val dir = freshLake()
    val cur = Versioned.currentVersion(spark, dir)
    assert(cur == 3L)
    val m = sqlM(s"VACUUM ${tbl(dir)} RETAIN 0 HOURS").collect().head
    assert(m == Row(1L, cur), s"expected one kept version, got $m")
    assert(state(Versioned.snapshot(spark, dir)).size == 5)
    intercept[Exception] { Versioned.snapshot(spark, dir, 0L).collect() }
  }

  test("RESTORE TO VERSION AS OF / TIMESTAMP AS OF: a NEW commit re-publishes the target state") {
    val dir = freshLake()
    val v0State = state(Versioned.snapshot(spark, dir, 0L))
    val cur = Versioned.currentVersion(spark, dir)
    val m = sqlM(s"RESTORE TABLE ${tbl(dir)} TO VERSION AS OF 0")
      .collect().head
    assert(m == Row(0L, cur + 1))
    assert(state(Versioned.snapshot(spark, dir)) == v0State)
    // history is append-only: the pre-restore state still travels
    assert(state(Versioned.snapshot(spark, dir, cur)).size == 5)
    // timestamp form: version 1 committed at ts=1001
    val m2 = sqlM(s"RESTORE ${tbl(dir)} TO TIMESTAMP AS OF 1001")
      .collect().head
    assert(m2.getLong(0) == 1L)
    assert(state(Versioned.snapshot(spark, dir)) ==
      state(Versioned.snapshot(spark, dir, 1L)))
  }

  test("CREATE TABLE ... SHALLOW CLONE [VERSION AS OF v]: metadata-only clone reads the source's state") {
    val dir = freshLake()
    val root = java.nio.file.Files.createTempDirectory("graft_mntc").toFile
    root.deleteOnExit()
    val dst = new java.io.File(root, "clone").getAbsolutePath
    sqlM(s"CREATE TABLE graft_mnt.`$dst` SHALLOW CLONE ${tbl(dir)}")
    assert(state(Versioned.snapshot(spark, dst)) ==
      state(Versioned.snapshot(spark, dir)))
    val dst0 = new java.io.File(root, "clone0").getAbsolutePath
    sqlM(s"CREATE TABLE graft_mnt.`$dst0` SHALLOW CLONE ${tbl(dir)} " +
      "VERSION AS OF 0")
    assert(state(Versioned.snapshot(spark, dst0)) ==
      state(Versioned.snapshot(spark, dir, 0L)))
  }

  test("REORG TABLE ... APPLY (PURGE): folds pending MOR tombstones into the data (Delta's spelling)") {
    val dir = freshLake()
    Versioned.deleteWhere(spark, dir, col("id") === 10L, Seq("site", "id"))
    assert(Versioned.deleteFilesAt(spark, dir,
      Versioned.currentVersion(spark, dir)).nonEmpty)
    val expected = state(Versioned.snapshot(spark, dir))
    sqlM(s"REORG TABLE ${tbl(dir)} APPLY (PURGE)")
    assert(Versioned.deleteFilesAt(spark, dir,
      Versioned.currentVersion(spark, dir)).isEmpty,
      "PURGE must leave no pending tombstones")
    assert(state(Versioned.snapshot(spark, dir)) == expected)
  }

  test("ownership: non-maintenance statements (incl. CTAS with a 'shallow clone' string) delegate; malformed verbs and non-graft catalogs refuse loudly") {
    assert(GraftSqlParser.parseMaintenance(spark,
      "SELECT 1").isEmpty)
    assert(GraftSqlParser.parseMaintenance(spark,
      "CREATE TABLE t AS SELECT 'shallow clone' AS s").isEmpty,
      "a string literal must not be claimed as a clone statement")
    assert(GraftSqlParser.parseMaintenance(spark,
      "CREATE TABLE `shallow clone stuff` (id INT)").isEmpty)
    val dir = freshLake()
    // unqualified table: refused with the catalog guidance
    val e1 = intercept[Exception] {
      GraftSqlParser.parseMaintenance(spark, s"OPTIMIZE `$dir`") }
    assert(e1.getMessage.contains("catalog"), e1.getMessage)
    // a catalog that exists but is not graft
    val e2 = intercept[Exception] {
      GraftSqlParser.parseMaintenance(spark,
        s"VACUUM spark_catalog.default.t") }
    assert(e2.getMessage.contains("graft"), e2.getMessage)
    // trailing garbage
    val e3 = intercept[Exception] {
      GraftSqlParser.parseMaintenance(spark,
        s"OPTIMIZE ${tbl(dir)} EXTRA") }
    assert(e3.getMessage.contains("trailing"), e3.getMessage)
  }
}
