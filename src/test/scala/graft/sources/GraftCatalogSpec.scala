package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.Versioned
import graft.ops.MergeData

/** The `graft` SQL catalog: lakes addressable by directory in plain
  * SQL, with Spark's own `VERSION AS OF` / `TIMESTAMP AS OF` syntax
  * resolving through the manifest log, correct under column mapping
  * and MOR tombstones, and read-only (mutations refused by name). */
class GraftCatalogSpec extends SparkSpec {

  private def state(d: DataFrame): Set[(String, Long, Double)] =
    d.select("site", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  private def freshLake(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cat").toFile
    dir.deleteOnExit()
    MergeData.writeMerged(spark,
      df(Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 10L, 10.0)),
        "site", "id", "v"),
      dir.getAbsolutePath, keys = Seq("site"))
    dir.getAbsolutePath
  }

  private def sqlOn(dir: String, suffix: String = ""): DataFrame = {
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.GraftCatalog")
    spark.sql(s"SELECT * FROM graft.`$dir` $suffix")
  }

  test("SQL names a lake by directory; VERSION AS OF and TIMESTAMP AS OF travel through the manifest log") {
    val dir = freshLake()
    Versioned.init(spark, dir, commitTs = 1000L)
    Versioned.mergeInto(spark, dir,
      df(Seq(("a", 1L, 100.0, false)), "site", "id", "v", "__delete"),
      Seq("site"), Seq("site", "id"), commitTs = 2000L)
    assert(state(sqlOn(dir)) == state(Versioned.snapshot(spark, dir)))
    assert(state(sqlOn(dir, "VERSION AS OF 0")) ==
      state(Versioned.snapshot(spark, dir, 0L)))
    // TIMESTAMP AS OF: commit ts are pinned (1000, 2000 epoch-millis);
    // 1.5s after epoch resolves to v0
    assert(state(sqlOn(dir,
      "TIMESTAMP AS OF '1970-01-01 00:00:01.500'")) ==
      state(Versioned.snapshot(spark, dir, 0L)))
    // aggregation + filter through the catalog scan
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val agg = spark.sql(
      s"SELECT site, count(*) AS n, round(sum(v), 2) AS s " +
        s"FROM graft.`$dir` WHERE id < 10 GROUP BY site ORDER BY site")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(agg.toSeq == Seq(("a", 2L, 102.0)))
  }

  test("SHOW TBLPROPERTIES rides Spark's machinery: graft.* speaks the same names ALTER sets, plus read-only operational facts; properties travel") {
    val dir = freshLake()
    Versioned.init(spark, dir, commitTs = 1000L)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    def props(): Map[String, String] =
      spark.sql(s"SHOW TBLPROPERTIES graft.`$dir`").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    val p0 = props()
    assert(p0("graft.partitionKeys") == "site")
    assert(p0("graft.version") == "0")
    // ALTER-set properties surface under the SAME names (rename first:
    // a constraint referencing the old name correctly blocks renames)
    spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN v TO reading")
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES " +
      "('graft.constraint.pos_v' = 'reading >= 0')")
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES " +
      "('graft.changeFeed.keys' = 'site,id')")
    val p1 = props()
    assert(p1("graft.constraint.pos_v") == "reading >= 0")
    assert(p1("graft.changeFeed.keys") == "site,id")
    assert(p1("graft.columnMapping.reading") == "v")
    assert(p1("graft.minReaderLevel").toInt >= 2,
      s"column mapping must raise the reader level (got $p1)")
    assert(p1("graft.features").contains("column-mapping"))
    // properties time-travel with the version pin (Spark's SHOW
    // grammar has no AS OF clause — the library accessor serves it)
    val v0props = Versioned.tableProperties(spark, dir, 0L)
    assert(!v0props.contains("graft.constraint.pos_v") &&
      v0props("graft.version") == "0",
      s"v0 must report v0's properties (got $v0props)")
  }

  test("catalog reads stay correct under column mapping and MOR tombstones; RENAME TABLE refuses; DROP TABLE removes") {
    val dir = freshLake()
    Versioned.init(spark, dir)
    Versioned.renameColumn(spark, dir, "v", "value")
    Versioned.deleteWhere(spark, dir, col("id") === 10L, Seq("site", "id"))
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    val d = spark.sql(s"SELECT * FROM graft.`$dir`")
    assert(d.columns.contains("value"), "logical names in SQL")
    assert(d.count() == 2L, "tombstoned row hidden in SQL")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` RENAME TO graft.`${dir}_y`")
    }
    assert(e.getMessage.contains("RENAME"))
    spark.sql(s"DROP TABLE graft.`$dir`")
    assert(Versioned.currentVersion(spark, dir) < 0 &&
      !new java.io.File(dir).exists(),
      "DROP TABLE must remove the manifest and the data")
  }
}
