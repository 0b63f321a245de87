package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.CatalogOps

/** Catalog-surface queries routed through the REAL [[CatalogOps]] module
  * (SURVEY.md §2.10): an S3-style key inventory is synthesized
  * deterministically from `events` — one data-file key per event
  * (`prefix/user/measurement/YYYYMMDD_HHMMSS[_i].csv.gz`, shard suffix on
  * every third event), one `schema.json` sidecar per (user, measurement),
  * plus malformed keys (3-part "orphan" keys that the parser must DROP,
  * `main.py:131`, and well-formed keys with unparseable filenames that
  * keep null date/time, `main.py:24-41`). The DuckDB oracles rebuild the
  * identical key set in SQL, so [[CatalogOps.inventoryFromKeys]]'s parse,
  * drop, and classification semantics are all hash-verified.
  */
object CatalogQueries {

  /** The synthesized key universe (see class doc). */
  def eventKeys(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val dataKeys = ev.select(concat(
      lit("study/u"), col("user_id").cast("string"),
      lit("/"), col("event_type"), lit("/"),
      date_format(col("ts"), "yyyyMMdd"), lit("_"), date_format(col("ts"), "HHmmss"),
      when(col("event_id") % 3 === 0,
        concat(lit("_"), (col("event_id") % 5).cast("string"))).otherwise(lit("")),
      lit(".csv.gz")).as("key"))
    val schemaKeys = ev.select(concat(
      lit("study/u"), col("user_id").cast("string"),
      lit("/"), col("event_type"), lit("/schema.json")).as("key")).distinct()
    val orphanKeys = ev.filter(col("event_id") % 97 === 0)
      .select(concat(lit("study/u"), col("user_id").cast("string"), lit("/orphan")).as("key"))
    val badNameKeys = ev.filter(col("event_id") % 89 === 0)
      .select(concat(lit("study/u"), col("user_id").cast("string"),
        lit("/"), col("event_type"), lit("/badname.csv.gz")).as("key"))
    dataKeys.unionAll(schemaKeys).unionAll(orphanKeys).unionAll(badNameKeys)
  }

  def inventory(s: SparkSession, dir: String): DataFrame =
    CatalogOps.inventoryFromKeys(eventKeys(s, dir))

  /** SQL twin of [[eventKeys]] + [[CatalogOps.inventoryFromKeys]]. */
  val inventoryCte: String = """
    base AS (SELECT event_id, 'u' || user_id::VARCHAR AS u, event_type AS m,
                    strftime(ts, '%Y%m%d') AS d8, strftime(ts, '%H%M%S') AS t6
             FROM events),
    keys AS (
      SELECT 'study/' || u || '/' || m || '/' || d8 || '_' || t6 ||
             (CASE WHEN event_id % 3 = 0 THEN '_' || (event_id % 5)::VARCHAR
                   ELSE '' END) || '.csv.gz' AS key
      FROM base
      UNION ALL
      SELECT DISTINCT 'study/' || u || '/' || m || '/schema.json' FROM base
      UNION ALL
      SELECT 'study/' || u || '/orphan' FROM base WHERE event_id % 97 = 0
      UNION ALL
      SELECT 'study/' || u || '/' || m || '/badname.csv.gz' FROM base
      WHERE event_id % 89 = 0),
    parts AS (SELECT string_split(key, '/') AS p FROM keys),
    inv AS (SELECT p[2] AS user_id, p[3] AS measurement, p[4] AS filename,
                   ends_with(p[4], '.json') AS is_schema,
                   nullif(regexp_extract(p[4],
                     '^(\d{8})_(\d{4,6})(?:_(\d+))?\.csv\.gz$', 1), '') AS date,
                   nullif(regexp_extract(p[4],
                     '^(\d{8})_(\d{4,6})(?:_(\d+))?\.csv\.gz$', 3), '') AS idx
            FROM parts WHERE len(p) = 4),
    data_inv AS (SELECT * FROM inv WHERE NOT is_schema)"""

  val all: Seq[Q] = Seq(
    Q("q45_catalog_keys",
      (s, dir) => inventory(s, dir)
        .groupBy("is_schema")
        .agg(
          count(lit(1)).as("n_files"),
          count_distinct(col("user_id")).as("n_users"),
          count_distinct(col("measurement")).as("n_measurements"),
          count(when(col("idx").isNotNull, 1)).as("n_sharded"),
          count(when(col("date").isNull, 1)).as("n_unparsed"))
        .orderBy("is_schema"),
      Some(s"""
        WITH $inventoryCte
        SELECT is_schema, count(*) AS n_files,
               count(DISTINCT user_id) AS n_users,
               count(DISTINCT measurement) AS n_measurements,
               count(*) FILTER (idx IS NOT NULL) AS n_sharded,
               count(*) FILTER (date IS NULL) AS n_unparsed
        FROM inv GROUP BY 1 ORDER BY 1"""),
      "inventoryFromKeys: malformed-key drop, shard-idx parse, schema classification (main.py:122-150)"),

    // ---------------------------------------------------------------
    // check_summary_file staleness: cache the inventory with one
    // measurement's keys dropped and one retired key added, round-trip
    // it through the parquet cache, and diff against the live listing.
    // The oracle rebuilds both key sets in SQL, so the report's counts
    // pin the cache write/read AND the diff semantics.
    // ---------------------------------------------------------------
    Q("q57_catalog_staleness",
      (s, dir) => {
        import s.implicits._
        val live = inventory(s, dir)
        val retired = CatalogOps.inventoryFromKeys(
          Seq("study/u0/zz_retired/20200101_000000.csv.gz").toDF("key"))
        val cachedInv = live.filter(col("measurement") =!= "click")
          .unionByName(retired)
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val cachePath = new java.io.File(
          new java.io.File(sys.props("user.dir"), "target"),
          s"graft_catalog_cache_$tag").getAbsolutePath
        CatalogOps.writeCache(cachedInv, cachePath)
        CatalogOps.stalenessReport(CatalogOps.readCache(s, cachePath), live)
      },
      Some(s"""
        WITH $inventoryCte,
        k4 AS (SELECT DISTINCT key FROM keys
               WHERE len(string_split(key, '/')) = 4),
        cached AS (SELECT key FROM k4
                   WHERE string_split(key, '/')[3] <> 'click'
                   UNION ALL
                   SELECT 'study/u0/zz_retired/20200101_000000.csv.gz'),
        diff AS (SELECT l.key IS NOT NULL AS in_live,
                        c.key IS NOT NULL AS in_cache
                 FROM k4 l FULL JOIN cached c ON l.key = c.key)
        SELECT count(*) FILTER (in_cache) AS n_cached,
               count(*) FILTER (in_live) AS n_live,
               count(*) FILTER (in_live AND in_cache) AS n_common,
               count(*) FILTER (in_live AND NOT in_cache) AS n_added,
               count(*) FILTER (NOT in_live) AS n_removed,
               (count(*) FILTER (in_live IS DISTINCT FROM in_cache) = 0) AS fresh
        FROM diff"""),
      "check_summary_file staleness report: cache-vs-live listing diff (main.py:259-277)"),

    // ---------------------------------------------------------------
    // update_summary_file refresh WRITE path: seed the cache STALE
    // (one measurement dropped, one retired key planted — exactly
    // q57's divergence), refresh it from the live listing (the
    // reference's update = re-gather + replace, main.py:259-266), and
    // report from the refreshed cache READ-BACK. The oracle computes
    // over the live keys only: stale rows surviving the overwrite, or
    // a refresh that never landed, change the counts and fail the hash.
    // ---------------------------------------------------------------
    Q("q90_catalog_refresh",
      (s, dir) => {
        import s.implicits._
        val live = inventory(s, dir)
        val retired = CatalogOps.inventoryFromKeys(
          Seq("study/u0/zz_retired/20200101_000000.csv.gz").toDF("key"))
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val cachePath = new java.io.File(
          new java.io.File(sys.props("user.dir"), "target"),
          s"graft_catalog_cache_refresh_$tag").getAbsolutePath
        // seed stale (a small divergent subset is just as stale as a
        // full divergent copy, and halves the query's write cost),
        // then refresh = overwrite from live
        CatalogOps.writeCache(
          live.filter(col("measurement") === "view").limit(50)
            .unionByName(retired),
          cachePath)
        CatalogOps.writeCache(live, cachePath)
        CatalogOps.summaryReport(CatalogOps.readCache(s, cachePath))
      },
      Some(s"""
        WITH $inventoryCte
        SELECT user_id, measurement,
               count(*) AS file_count,
               min(date) AS first_date,
               max(date) AS last_date,
               count(DISTINCT date) AS distinct_dates
        FROM data_inv GROUP BY 1, 2 ORDER BY 1, 2"""),
      "update_summary_file refresh: stale cache overwritten from live, report from read-back (main.py:259-266)")
  )
}
