package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{CatalogOps, Overview, Presence, TimeOps}

/** SURVEY.md §2 operator inventory, exercised over the driver's TPC-H-ish
  * testdata (TESTDATA.md). Mapping of the reference's domain onto the
  * testdata lake: site/participant → user_id (`events`) or customer,
  * metric → event_type, file event-time → `events.ts`.
  *
  * Every query here reads through [[graft.Tables]], carries its DuckDB
  * oracle, and is written so filters/projections push into the parquet
  * scan and the plan has at most one shuffle more than the operator
  * fundamentally needs.
  */
object ReferenceQueries {

  private def events(s: SparkSession, dir: String) = Tables(s, dir, "events")
  private def orders(s: SparkSession, dir: String) = Tables(s, dir, "orders")
  private def lineitem(s: SparkSession, dir: String) = Tables(s, dir, "lineitem")
  private def customer(s: SparkSession, dir: String) = Tables(s, dir, "customer")
  private def nation(s: SparkSession, dir: String) = Tables(s, dir, "nation")
  private def region(s: SparkSession, dir: String) = Tables(s, dir, "region")

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // A1-A3 + O1: process-overview grouped stats (SURVEY §2.6).
    // ---------------------------------------------------------------
    Q("q01_overview_stats",
      (s, dir) => Overview.stats(events(s, dir), Seq("user_id", "event_type"), col("ts")),
      Some("""
        SELECT user_id, event_type,
               count(*) AS row_count,
               strftime(min(ts), '%Y-%m-%d') AS start_date,
               strftime(max(ts), '%Y-%m-%d') AS end_date,
               count(DISTINCT CAST(ts AS DATE)) AS day_count
        FROM events GROUP BY user_id, event_type
        ORDER BY user_id, event_type"""),
      "A1-A3 per-(site,participant,metric) stats ≙ per-(user,event_type)"),

    // ---------------------------------------------------------------
    // P3: time-bucket keys (month / ISO week / year).
    // ---------------------------------------------------------------
    Q("q02_bucket_month",
      (s, dir) => events(s, dir)
        .groupBy(TimeOps.monthKey(col("ts")).as("time_key"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .orderBy("time_key"),
      Some("""
        SELECT strftime(ts, '%Y-%m') AS time_key,
               count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1 ORDER BY 1""")),

    Q("q03_bucket_isoweek",
      (s, dir) => events(s, dir)
        .groupBy(TimeOps.isoWeekKey(col("ts")).as("time_key"))
        .agg(count(lit(1)).as("n"))
        .orderBy("time_key"),
      Some("""
        SELECT isoyear(ts)::VARCHAR || '-W' || lpad(weekofyear(ts)::VARCHAR, 2, '0') AS time_key,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1"""),
      "ISO week-based year via Thursday rule (SURVEY §2.2 P3)"),

    Q("q04_bucket_year",
      (s, dir) => events(s, dir)
        .groupBy(TimeOps.yearKey(col("ts")).as("time_key"))
        .agg(count(lit(1)).as("n"))
        .orderBy("time_key"),
      Some("""
        SELECT strftime(ts, '%Y') AS time_key, count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1""")),

    // ---------------------------------------------------------------
    // A4: the compute_stats bundle — mean/median/population-std/min/max.
    // ---------------------------------------------------------------
    Q("q05_feature_stats",
      (s, dir) => events(s, dir)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("total_entries"),
          count_distinct(to_date(col("ts"))).as("days_with_data"),
          round(avg("value"), 4).as("mean"),
          round(median(col("value")), 4).as("median"),
          round(stddev_pop(col("value")), 4).as("std_dev"),
          round(min("value"), 4).as("min"),
          round(max("value"), 4).as("max"))
        .orderBy("event_type"),
      Some("""
        SELECT event_type,
               count(*) AS total_entries,
               count(DISTINCT CAST(ts AS DATE)) AS days_with_data,
               round(avg(value), 4) AS mean,
               round(median(value), 4) AS median,
               round(stddev_pop(value), 4) AS std_dev,
               round(min(value), 4) AS min,
               round(max(value), 4) AS max
        FROM events GROUP BY event_type ORDER BY event_type"""),
      "A4 with np.std ddof=0 ≙ stddev_pop, exact median"),

    // ---------------------------------------------------------------
    // A14: presence long table (data_collection.py).
    // ---------------------------------------------------------------
    Q("q06_presence",
      (s, dir) => Presence.presenceTable(events(s, dir), Seq("user_id", "event_type"), col("ts")),
      Some("""
        SELECT DISTINCT user_id, event_type, strftime(ts, '%Y-%m-%d') AS date
        FROM events WHERE ts IS NOT NULL
        ORDER BY user_id, event_type, date""")),

    // ---------------------------------------------------------------
    // R1: pivot heatmap matrix (participant × value count per metric).
    // ---------------------------------------------------------------
    Q("q07_pivot",
      (s, dir) => Presence.pivotMatrix(
        events(s, dir), "user_id", "event_type", "event_id",
        Seq("click", "error", "purchase", "signup", "view")),
      Some("""
        SELECT user_id,
               count(*) FILTER (event_type = 'click')    AS click,
               count(*) FILTER (event_type = 'error')    AS error,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'signup')   AS signup,
               count(*) FILTER (event_type = 'view')     AS view
        FROM events GROUP BY user_id ORDER BY user_id"""),
      "R1 pivot with explicit value list → single-pass plan"),

    // ---------------------------------------------------------------
    // A10: per-(date,time) file counts (main.py file_counts).
    // ---------------------------------------------------------------
    Q("q08_file_counts",
      (s, dir) => events(s, dir)
        .groupBy(
          date_format(col("ts"), "yyyy-MM-dd").as("date"),
          date_format(col("ts"), "HH").as("hour"))
        .agg(count(lit(1)).as("n"))
        .orderBy("date", "hour"),
      Some("""
        SELECT strftime(ts, '%Y-%m-%d') AS date, strftime(ts, '%H') AS hour,
               count(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---------------------------------------------------------------
    // §2.10 catalog command surface over the inventory-analogue.
    // ---------------------------------------------------------------
    // q09-q12 run through the REAL CatalogOps module over the
    // synthesized key inventory (CatalogQueries.inventory), so the green
    // rows vouch for inventoryFromKeys + the command functions, not for
    // inline re-implementations.
    Q("q09_catalog_users",
      (s, dir) => CatalogOps.listAllUsers(CatalogQueries.inventory(s, dir)),
      Some(s"""
        WITH ${CatalogQueries.inventoryCte}
        SELECT DISTINCT user_id FROM data_inv ORDER BY user_id"""),
      "list_all_users via CatalogOps (main.py:175-182)"),

    Q("q10_catalog_measurements",
      (s, dir) => CatalogOps.listAllMeasurements(CatalogQueries.inventory(s, dir)),
      Some(s"""
        WITH ${CatalogQueries.inventoryCte}
        SELECT DISTINCT measurement FROM data_inv ORDER BY measurement"""),
      "list_all_measurements via CatalogOps (main.py:155-173)"),

    Q("q11_users_for_measurement",
      (s, dir) => {
        val uf = CatalogOps.usersForMeasurement(
            CatalogQueries.inventory(s, dir), "purchase")
          .select(substring(col("user_id"), 2, 18).try_cast("bigint").as("custkey"))
        customer(s, dir)
          .join(uf, col("c_custkey") === col("custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM events e
                      WHERE e.user_id = customer.c_custkey
                        AND e.event_type = 'purchase')
        ORDER BY c_custkey"""),
      "J2 semi-join: get_users_for_measurement via CatalogOps (main.py:212-236)"),

    Q("q12_summary_report",
      (s, dir) => CatalogOps.summaryReport(CatalogQueries.inventory(s, dir)),
      Some(s"""
        WITH ${CatalogQueries.inventoryCte}
        SELECT user_id, measurement,
               count(*) AS file_count,
               min(date) AS first_date,
               max(date) AS last_date,
               count(DISTINCT date) AS distinct_dates
        FROM data_inv GROUP BY 1, 2 ORDER BY 1, 2"""),
      "generate_summary_report via CatalogOps (main.py:238-257)"),

    // ---------------------------------------------------------------
    // A9: histogram — count by bucketed response.
    // ---------------------------------------------------------------
    Q("q13_histogram",
      (s, dir) => events(s, dir)
        .groupBy(
          col("event_type"),
          floor(col("value") / 25).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bucket"),
      Some("""
        SELECT event_type, CAST(floor(value / 25) AS BIGINT) AS bucket, count(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---------------------------------------------------------------
    // A13: device sub-split — metric renamed metric/device.
    // ---------------------------------------------------------------
    Q("q14_device_split",
      (s, dir) => events(s, dir)
        .withColumn("metric_device",
          concat_ws("/", col("event_type"), get_json_object(col("props"), "$.k")))
        .groupBy("metric_device")
        .agg(count(lit(1)).as("row_count"))
        .orderBy("metric_device"),
      Some("""
        SELECT event_type || '/' || json_extract_string(props, '$.k') AS metric_device,
               count(*) AS row_count
        FROM events GROUP BY 1 ORDER BY 1"""),
      "A13 device split (process-overview.py:129-150); device ≙ props.k"),

    // ---------------------------------------------------------------
    // P5: numeric coercion with null-on-failure (float() try/except).
    // ---------------------------------------------------------------
    Q("q15_coerce",
      (s, dir) => Tables(s, dir, "documents")
        .select(
          col("doc_id"),
          substring(col("text"), 1, 2).try_cast("double").as("coerced"))
        .groupBy(col("coerced").isNotNull.as("is_numeric"))
        .agg(count(lit(1)).as("n"))
        .orderBy("is_numeric"),
      Some("""
        SELECT TRY_CAST(substr(text, 1, 2) AS DOUBLE) IS NOT NULL AS is_numeric,
               count(*) AS n
        FROM documents GROUP BY 1 ORDER BY 1""")),

    // ---------------------------------------------------------------
    // U1: cross-schema union drift (pandas concat NaN-fill semantics).
    // ---------------------------------------------------------------
    Q("q16_union_drift",
      (s, dir) => {
        val li = lineitem(s, dir)
        val a = li.select(col("l_orderkey"), col("l_quantity"))
        val b = li.select(col("l_orderkey"), col("l_extendedprice"))
        a.unionByName(b, allowMissingColumns = true)
          .groupBy("l_orderkey")
          .agg(
            count(lit(1)).as("n"),
            round(sum("l_quantity"), 4).as("sum_qty"),
            round(sum("l_extendedprice"), 4).as("sum_price"))
          .orderBy("l_orderkey")
      },
      Some("""
        WITH u AS (
          SELECT l_orderkey, l_quantity, NULL::DOUBLE AS l_extendedprice FROM lineitem
          UNION ALL
          SELECT l_orderkey, NULL::DOUBLE AS l_quantity, l_extendedprice FROM lineitem)
        SELECT l_orderkey, count(*) AS n,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_price
        FROM u GROUP BY 1 ORDER BY 1"""),
      "U1 unionByName(allowMissingColumns) ≙ pd.concat column alignment"),

    // ---------------------------------------------------------------
    // P1: lineage column attach.
    // ---------------------------------------------------------------
    Q("q17_merge_lineage",
      (s, dir) => lineitem(s, dir)
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          lit("siteA").as("site"),
          lit("2024-10-17T09:30:00").as("file_timestamp"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber,
               'siteA' AS site, '2024-10-17T09:30:00' AS file_timestamp
        FROM lineitem WHERE l_orderkey < 100
        ORDER BY l_orderkey, l_linenumber""")),

    // ---------------------------------------------------------------
    // J1/F7: config→file substring routing, first match wins.
    // ---------------------------------------------------------------
    Q("q18_routing",
      (s, dir) => {
        import s.implicits._
        val specs = Seq(("src1", 1), ("rc1", 2), ("src", 3))
          .toDF("spec_source", "priority")
        val docs = Tables(s, dir, "documents")
        val w = Window.partitionBy(col("doc_id")).orderBy(col("priority"))
        docs.join(broadcast(specs), col("source").contains(col("spec_source")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("source"), col("spec_source"), col("priority"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, source, spec_source, priority FROM (
          SELECT d.doc_id, d.source, s.spec_source, s.priority,
                 row_number() OVER (PARTITION BY d.doc_id ORDER BY s.priority) AS rn
          FROM documents d
          JOIN (VALUES ('src1', 1), ('rc1', 2), ('src', 3)) AS s(spec_source, priority)
            ON position(s.spec_source IN d.source) > 0)
        WHERE rn = 1 ORDER BY doc_id"""),
      "J1 broadcast theta-join + row_number ≙ first-match break (extract_patient_summary.py:265-284)"),

    // ---------------------------------------------------------------
    // O4: top-k (TakeOrderedAndProject — no full sort at scale).
    // ---------------------------------------------------------------
    Q("q19_topk",
      (s, dir) => orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice")),
      Some("""
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        FROM orders ORDER BY orders.o_totalprice DESC, o_orderkey LIMIT 10""")),

    // ---------------------------------------------------------------
    // Window functions: running aggregates per partition.
    // ---------------------------------------------------------------
    Q("q20_window",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, dir)
          .filter(col("user_id") < 20)
          .withColumn("rn", row_number().over(w))
          .withColumn("running_value",
            round(sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4))
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .select("user_id", "event_id", "rn", "running_value", "prev_type")
          .orderBy("user_id", "rn")
      },
      Some("""
        SELECT user_id, event_id,
               row_number() OVER w AS rn,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
               lag(event_type, 1) OVER w AS prev_type
        FROM events WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, rn""")),

    // ---------------------------------------------------------------
    // U3 as rollup: per-site + all-sites combined in one pass.
    // ---------------------------------------------------------------
    Q("q21_rollup",
      (s, dir) => {
        val c = customer(s, dir); val o = orders(s, dir)
        val n = nation(s, dir); val r = region(s, dir)
        // Dataset.rollup trips Spark's ambiguous-self-join detector (the
        // Expand node carries each grouping column twice), so the rollup
        // itself goes through the SQL resolution path over a temp view —
        // identical plan, no dataset-id tags.
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(r("r_name").as("region_nm"), n("n_name").as("nation_nm"),
            o("o_totalprice"))
          .createOrReplaceTempView("q21_rollup_input")
        s.sql("""
          SELECT coalesce(region_nm, 'ALL') AS region_name,
                 coalesce(nation_nm, 'ALL') AS nation_name,
                 count(*) AS n_orders,
                 round(sum(o_totalprice), 2) AS revenue
          FROM q21_rollup_input
          GROUP BY ROLLUP (region_nm, nation_nm)
          ORDER BY region_name, nation_name""")
      },
      Some("""
        SELECT coalesce(r_name, 'ALL') AS region_name,
               coalesce(n_name, 'ALL') AS nation_name,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY region_name, nation_name"""),
      "U3 per-site + all_sites dual output as a single rollup pass"),

    // ---------------------------------------------------------------
    // Join surface: 3-way join + agg + top-k (TPC-H Q3 shape).
    // ---------------------------------------------------------------
    Q("q22_join3",
      (s, dir) => {
        val c = customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = orders(s, dir); val li = lineitem(s, dir)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"), "left_semi")
          .groupBy("l_orderkey")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE EXISTS (SELECT 1 FROM customer
                      WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
        GROUP BY l_orderkey
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---------------------------------------------------------------
    // Anti join. Pinned against HIGH-VALUE orders (not all orders —
    // every customer has SOME order at every SF, which made the anti
    // side empty and the gate row vacuously green): customers with no
    // order above 300k are a real minority slice at all 3 SFs
    // (3 / 30 / 308 rows at sf0.001/0.01/0.1).
    // ---------------------------------------------------------------
    Q("q23_anti",
      (s, dir) => customer(s, dir)
        .join(orders(s, dir).filter(col("o_totalprice") > 300000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_totalprice > 300000)
        ORDER BY c_custkey""")),

    // ---------------------------------------------------------------
    // As-of join: most recent event at-or-before each order date.
    // ---------------------------------------------------------------
    Q("q24_asof",
      (s, dir) => {
        val o = orders(s, dir).filter(col("o_custkey") <= 30)
        val e = events(s, dir).select(col("user_id"), col("ts"))
        o.join(e, col("user_id") === col("o_custkey") && col("ts") <= col("o_orderdate"), "left")
          .groupBy("o_orderkey", "o_custkey")
          .agg(date_format(max("ts"), "yyyy-MM-dd HH:mm:ss").as("last_event_ts"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey,
               strftime((SELECT max(e.ts) FROM events e
                         WHERE e.user_id = o.o_custkey AND e.ts <= o.o_orderdate),
                        '%Y-%m-%d %H:%M:%S') AS last_event_ts
        FROM orders o WHERE o_custkey <= 30
        ORDER BY o_orderkey"""),
      "as-of join via range join + max; union+last(ignoreNulls) window at scale"),

    // ---------------------------------------------------------------
    // O4: intersect / except.
    // ---------------------------------------------------------------
    // Pinned so BOTH set operations do real work at every SF (the old
    // `except all-error-users` removed everyone — 0 rows, vacuous
    // green): excepting only ERROR-HEAVY users (> 10 error events)
    // keeps 4 / 32 / 354 of the 15 / 150 / 1500 intersect users.
    Q("q25_setops",
      (s, dir) => {
        val e = events(s, dir)
        def users(t: String) = e.filter(col("event_type") === t).select("user_id")
        val errorHeavy = e.filter(col("event_type") === "error")
          .groupBy("user_id").agg(count(lit(1)).as("n"))
          .filter(col("n") > 10).select("user_id")
        users("click").intersect(users("purchase")).except(errorHeavy)
          .orderBy("user_id")
      },
      Some("""
        (SELECT user_id FROM events WHERE event_type = 'click'
         INTERSECT
         SELECT user_id FROM events WHERE event_type = 'purchase')
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error'
        GROUP BY user_id HAVING count(*) > 10
        ORDER BY user_id""")),

    // ---------------------------------------------------------------
    // Skew-salted shuffle join (graft.ops.Skew): the oracle is the
    // PLAIN join — proving the 8-way salted rewrite is result-identical
    // while spreading each hot key over 8 reducers.
    // ---------------------------------------------------------------
    Q("q51_salted_join",
      (s, dir) => graft.ops.Skew.saltedJoin(
          lineitem(s, dir), orders(s, dir).select("o_orderkey", "o_orderpriority"),
          "l_orderkey", "o_orderkey", nSalts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1"""),
      "salted join == plain join; salt splits hot keys across reducers"),

    // ---------------------------------------------------------------
    // Gap-based sessionization (batch twin of the streaming
    // flatMapGroupsWithState form — graft.streaming.Sessionize).
    // Integer-micros gap math on both sides; one shuffle on user_id
    // shared by the windows AND the final groupBy.
    // ---------------------------------------------------------------
    Q("q52_sessionize",
      (s, dir) => {
        val e = events(s, dir).select(
          col("user_id"), col("event_id"), col("value"),
          expr("unix_micros(cast(ts as timestamp))").as("tsu"))
        graft.streaming.Sessionize.batch(e, gapUs = 1800L * 1000000L)
          .select(
            col("user_id"), col("session_no"),
            date_format(timestamp_micros(col("session_start_us")),
              "yyyy-MM-dd HH:mm:ss").as("session_start"),
            date_format(timestamp_micros(col("session_end_us")),
              "yyyy-MM-dd HH:mm:ss").as("session_end"),
            expr("(session_end_us - session_start_us) div 1000000").as("duration_sec"),
            col("n_events"),
            round(col("sum_value"), 4).as("sum_value"))
          .orderBy("user_id", "session_no")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS tsu FROM events
        ), flagged AS (
          SELECT user_id, event_id, value, tsu,
                 CASE WHEN lag(tsu) OVER w IS NULL
                        OR tsu - lag(tsu) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
        ), numbered AS (
          SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
          FROM flagged
        )
        SELECT user_id, session_no,
               strftime(make_timestamp(min(tsu)), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(make_timestamp(max(tsu)), '%Y-%m-%d %H:%M:%S') AS session_end,
               (max(tsu) - min(tsu)) // 1000000 AS duration_sec,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM numbered GROUP BY user_id, session_no
        ORDER BY user_id, session_no"""),
      "30-min-gap sessions: lag flag + running sum; batch twin of streaming Sessionize"),

    // ---------------------------------------------------------------
    // Bucketed co-located join (graft.ops.Bucketing): both sides
    // bucketed 8 ways on the join key at write time, so the join plans
    // with NO runtime exchange (BucketingSpec asserts the plan). The
    // oracle is the PLAIN join — bucketing must not change results.
    // First run per JVM pays the one-time bucketed write (the "shuffle
    // once at write" cost model, honestly included in one-shot bench).
    // ---------------------------------------------------------------
    Q("q53_bucketed_join",
      (s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val (tl, to) = (s"b_lineitem_$tag", s"b_orders_$tag")
        ReferenceQueries.synchronized {
          if (!s.catalog.tableExists(tl))
            graft.ops.Bucketing.writeBucketed(
              lineitem(s, dir).select("l_orderkey", "l_extendedprice", "l_discount"),
              tl, "l_orderkey", nBuckets = 8)
          if (!s.catalog.tableExists(to))
            graft.ops.Bucketing.writeBucketed(
              orders(s, dir).select("o_orderkey", "o_orderpriority"),
              to, "o_orderkey", nBuckets = 8)
        }
        graft.ops.Bucketing.bucketedJoin(s, tl, to, "l_orderkey", "o_orderkey")
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1"""),
      "bucketed join == plain join; write-time shuffle, exchange-free runtime plan"),

    // ---------------------------------------------------------------
    // Mergeable HLL distinct counts (graft.ops.ApproxDistinct). The
    // exact-count oracle holds because verify-scale cardinalities stay
    // in the sketch's sparse-exact regime (ApproxDistinctSpec pins the
    // approx regime's error envelope separately).
    // ---------------------------------------------------------------
    Q("q54_approx_distinct",
      (s, dir) => graft.ops.ApproxDistinct.mergeEstimate(
          // lgConfigK=14: set-mode-exact to ~4k distincts — sized for
          // the benched cardinality (sf0.1 has 1.5k users/type), the
          // rightsizing any production sketch deployment does
          graft.ops.ApproxDistinct.sketchPartials(
            events(s, dir), Seq("event_type"), col("user_id"), lgConfigK = 14),
          Seq("event_type"))
        .orderBy("event_type"),
      Some("""
        SELECT event_type, count(DISTINCT user_id) AS distinct_est
        FROM events GROUP BY 1 ORDER BY 1"""),
      "HLL sketch partials + union-estimate; sparse-exact at verify scale"),

    // ---------------------------------------------------------------
    // Bloom-filter semi-join pruning (graft.ops.BloomPrune): the dim
    // keys aggregate into one bloom filter whose might_contain drops
    // fact rows map-side BEFORE the join shuffle. The oracle is the
    // PLAIN semi-join — pruning plus the exact join behind it must be
    // result-identical (false positives are filtered, never kept).
    // ---------------------------------------------------------------
    Q("q68_bloom_semi_join",
      (s, dir) => graft.ops.BloomPrune.prunedSemiJoin(
          orders(s, dir),
          customer(s, dir).filter(col("c_mktsegment") === "BUILDING"),
          "o_custkey", "c_custkey",
          expectedItems = 1L << 16, fpp = 0.01)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus"),
      Some("""
        SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        WHERE EXISTS (SELECT 1 FROM customer
                      WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
        GROUP BY 1 ORDER BY 1"""),
      "bloom prune + semi-join == plain semi-join; fact rows drop pre-shuffle"),

    // ---------------------------------------------------------------
    // Banded range join (graft.ops.RangeJoin): purchases inside global
    // error-burst windows — a point-in-interval join with NO equi key,
    // rewritten as a bucket equi-join (the plan Spark won't produce on
    // its own; the naive BETWEEN theta-join is a BNLJ). Windows come
    // from gap-sessionizing the error stream (Sessionize.batch with a
    // constant key), so the oracle derives the identical intervals.
    // ---------------------------------------------------------------
    Q("q70_range_join",
      (s, dir) => {
        val e = events(s, dir).select(
          col("event_id"), col("event_type"), col("value"),
          expr("unix_micros(cast(ts as timestamp))").as("tsu"))
          .filter(col("tsu").isNotNull)
        val bursts = graft.streaming.Sessionize.batch(
            e.filter(col("event_type") === "error").withColumn("user_id", lit(0L)),
            gapUs = 3600L * 1000000L)
          .filter(col("n_events") >= 2)
          .select(col("session_start_us").as("win_lo"),
            col("session_end_us").as("win_hi"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("tsu"), col("value"))
        graft.ops.RangeJoin.bandedIntervalJoin(
            purchases, bursts, "tsu", "win_lo", "win_hi",
            bandWidth = 3600L * 1000000L)
          .groupBy("win_lo", "win_hi")
          .agg(count(lit(1)).as("n_purchases"),
            round(sum("value"), 4).as("sum_value"))
          .select(
            date_format(timestamp_micros(col("win_lo")), "yyyy-MM-dd HH:mm:ss")
              .as("window_start"),
            date_format(timestamp_micros(col("win_hi")), "yyyy-MM-dd HH:mm:ss")
              .as("window_end"),
            col("n_purchases"), col("sum_value"))
          .orderBy("window_start")
      },
      Some("""
        WITH e AS (
          SELECT event_id, event_type, value, epoch_ns(ts) // 1000 AS tsu
          FROM events WHERE ts IS NOT NULL
        ), err AS (
          SELECT tsu, event_id FROM e WHERE event_type = 'error'
        ), flagged AS (
          SELECT tsu, event_id,
                 CASE WHEN lag(tsu) OVER w IS NULL
                        OR tsu - lag(tsu) OVER w > 3600000000 THEN 1 ELSE 0 END AS ns
          FROM err WINDOW w AS (ORDER BY tsu, event_id)
        ), numbered AS (
          SELECT tsu, sum(ns) OVER (ORDER BY tsu, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
          FROM flagged
        ), bursts AS (
          SELECT min(tsu) AS win_lo, max(tsu) AS win_hi
          FROM numbered GROUP BY sess HAVING count(*) >= 2
        ), p AS (SELECT tsu, value FROM e WHERE event_type = 'purchase')
        SELECT strftime(make_timestamp(b.win_lo), '%Y-%m-%d %H:%M:%S') AS window_start,
               strftime(make_timestamp(b.win_hi), '%Y-%m-%d %H:%M:%S') AS window_end,
               count(*) AS n_purchases, round(sum(p.value), 4) AS sum_value
        FROM bursts b JOIN p ON p.tsu BETWEEN b.win_lo AND b.win_hi
        GROUP BY b.win_lo, b.win_hi ORDER BY window_start"""),
      "no-equi-key range join as bucket equi-join; intervals explode, points don't"),

    // ---------------------------------------------------------------
    // Mergeable quantile sketch (graft.ops.QuantileSketch): per-type
    // value percentiles WITHOUT a per-group sort — fixed-bin histogram
    // partials built per shard, merged by addition, interpolated at
    // read. The Spark side deliberately splits the input in two,
    // sketches each half, and merges — so the oracle (one-pass
    // histogram + identical interpolation) verifies the MERGE, not
    // just the happy path.
    // ---------------------------------------------------------------
    Q("q71_quantile_sketch",
      (s, dir) => {
        val e = events(s, dir)
        val shards = Seq(0, 1).map(i =>
          graft.ops.QuantileSketch.sketchPartials(
            e.filter(pmod(col("user_id"), lit(2)) === i),
            Seq("event_type"), "value", lo = 0.0, hi = 512.0, nBins = 256))
        // estimate() merges the raw shard union itself (the misuse-safe
        // contract); rounding is presentation-layer, mirroring the oracle
        graft.ops.QuantileSketch.estimate(
            shards.reduce(_ unionByName _), Seq("event_type"),
            lo = 0.0, hi = 512.0, nBins = 256,
            qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
          .select(col("event_type"),
            round(col("p50"), 4).as("p50"),
            round(col("p90"), 4).as("p90"),
            round(col("p99"), 4).as("p99"))
          .orderBy("event_type")
      },
      Some("""
        WITH b AS (
          SELECT event_type,
                 least(greatest(floor((value - 0.0) / 2.0), 0), 255)::BIGINT AS bin,
                 count(*) AS cnt
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        ), c AS (
          SELECT event_type, bin, cnt,
                 sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                   ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(cnt) OVER (PARTITION BY event_type) AS total
          FROM b
        )
        SELECT event_type,
               min(CASE WHEN cum - cnt < total * 0.5 AND cum >= total * 0.5
                     THEN round(0.0 + (bin + (total * 0.5 - (cum - cnt)) / cnt) * 2.0, 4)
                   END) AS p50,
               min(CASE WHEN cum - cnt < total * 0.9 AND cum >= total * 0.9
                     THEN round(0.0 + (bin + (total * 0.9 - (cum - cnt)) / cnt) * 2.0, 4)
                   END) AS p90,
               min(CASE WHEN cum - cnt < total * 0.99 AND cum >= total * 0.99
                     THEN round(0.0 + (bin + (total * 0.99 - (cum - cnt)) / cnt) * 2.0, 4)
                   END) AS p99
        FROM c GROUP BY 1 ORDER BY 1"""),
      "histogram sketch partials merge additively; quantiles from cumsum, no sort"),

    // ---------------------------------------------------------------
    // Banded interval-OVERLAP join (RangeJoin.bandedOverlapJoin): which
    // user sessions were live during each error-burst window — interval
    // × interval with no equi key. Both sides explode across time
    // buckets; a pair meets once (emit-once = first shared bucket), so
    // no distinct pass. Bursts reuse q70's derivation; sessions are the
    // q52 gap rule per user.
    // ---------------------------------------------------------------
    Q("q78_overlap_join",
      (s, dir) => {
        val e = events(s, dir).select(
          col("event_id"), col("user_id"), col("event_type"), col("value"),
          expr("unix_micros(cast(ts as timestamp))").as("tsu"))
          .filter(col("tsu").isNotNull)
        val bursts = graft.streaming.Sessionize.batch(
            e.filter(col("event_type") === "error").withColumn("user_id", lit(0L)),
            gapUs = 3600L * 1000000L)
          .filter(col("n_events") >= 2)
          .select(col("session_start_us").as("win_lo"),
            col("session_end_us").as("win_hi"))
        val sessions = graft.streaming.Sessionize.batch(
            e, gapUs = 1800L * 1000000L)
          .filter(col("n_events") >= 3)
          .select(col("user_id"), col("session_start_us").as("s_lo"),
            col("session_end_us").as("s_hi"))
        graft.ops.RangeJoin.bandedOverlapJoin(
            bursts, sessions, "win_lo", "win_hi", "s_lo", "s_hi",
            bandWidth = 3600L * 1000000L)
          .groupBy("win_lo", "win_hi")
          .agg(count(lit(1)).as("n_sessions"),
            countDistinct("user_id").as("n_users"))
          .select(
            date_format(timestamp_micros(col("win_lo")), "yyyy-MM-dd HH:mm:ss")
              .as("window_start"),
            date_format(timestamp_micros(col("win_hi")), "yyyy-MM-dd HH:mm:ss")
              .as("window_end"),
            col("n_sessions"), col("n_users"))
          .orderBy("window_start")
      },
      Some("""
        WITH e AS (
          SELECT event_id, user_id, event_type, value, epoch_ns(ts) // 1000 AS tsu
          FROM events WHERE ts IS NOT NULL
        ), err AS (
          SELECT tsu, event_id FROM e WHERE event_type = 'error'
        ), eflag AS (
          SELECT tsu, event_id,
                 CASE WHEN lag(tsu) OVER w IS NULL
                        OR tsu - lag(tsu) OVER w > 3600000000 THEN 1 ELSE 0 END AS ns
          FROM err WINDOW w AS (ORDER BY tsu, event_id)
        ), enum AS (
          SELECT tsu, sum(ns) OVER (ORDER BY tsu, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
          FROM eflag
        ), bursts AS (
          SELECT min(tsu) AS win_lo, max(tsu) AS win_hi
          FROM enum GROUP BY sess HAVING count(*) >= 2
        ), sflag AS (
          SELECT user_id, tsu, event_id,
                 CASE WHEN lag(tsu) OVER w IS NULL
                        OR tsu - lag(tsu) OVER w > 1800000000 THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
        ), snum AS (
          SELECT user_id, tsu, sum(ns) OVER (PARTITION BY user_id
            ORDER BY tsu, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
          FROM sflag
        ), sess AS (
          SELECT user_id, min(tsu) AS s_lo, max(tsu) AS s_hi
          FROM snum GROUP BY user_id, sess HAVING count(*) >= 3
        )
        SELECT strftime(make_timestamp(b.win_lo), '%Y-%m-%d %H:%M:%S') AS window_start,
               strftime(make_timestamp(b.win_hi), '%Y-%m-%d %H:%M:%S') AS window_end,
               count(*) AS n_sessions, count(DISTINCT s.user_id) AS n_users
        FROM bursts b JOIN sess s ON b.win_lo <= s.s_hi AND s.s_lo <= b.win_hi
        GROUP BY b.win_lo, b.win_hi ORDER BY window_start"""),
      "interval-overlap as bucket equi-join with emit-once first-shared-bucket rule"),

    // ---------------------------------------------------------------
    // Conversion funnel (graft.ops.Funnel): view → click → purchase
    // with earliest-strictly-after semantics, as cascaded per-stage
    // min-aggregations — one equi-join + groupBy per stage, each
    // carrying only its own event type; no per-user event arrays.
    // Delay averages run on exact integer micros (sums < 2^53), so the
    // cross-engine double division is bit-stable.
    // ---------------------------------------------------------------
    Q("q81_funnel",
      (s, dir) => {
        val e = events(s, dir).select(
          col("user_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("tsu"))
          .filter(col("tsu").isNotNull)
        graft.ops.Funnel.stageTimes(e, "user_id", "tsu", "event_type",
            Seq("view", "click", "purchase"))
          .agg(
            count(col("t1")).as("n_view"),
            count(col("t2")).as("n_click"),
            count(col("t3")).as("n_purchase"),
            round(avg(col("t2") - col("t1")) / 1000000.0, 2).as("avg_view_to_click_s"),
            round(avg(col("t3") - col("t2")) / 1000000.0, 2).as("avg_click_to_purchase_s"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tsu
          FROM events WHERE ts IS NOT NULL
        ), s1 AS (
          SELECT user_id, min(tsu) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY 1
        ), s2 AS (
          SELECT e.user_id, min(tsu) AS t2 FROM e JOIN s1 USING (user_id)
          WHERE event_type = 'click' AND tsu > t1 GROUP BY 1
        ), s3 AS (
          SELECT e.user_id, min(tsu) AS t3 FROM e JOIN s2 USING (user_id)
          WHERE event_type = 'purchase' AND tsu > t2 GROUP BY 1
        ), f AS (
          SELECT s1.user_id, t1, t2, t3
          FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        )
        SELECT count(t1) AS n_view, count(t2) AS n_click,
               count(t3) AS n_purchase,
               round(avg(t2 - t1) / 1000000.0, 2) AS avg_view_to_click_s,
               round(avg(t3 - t2) / 1000000.0, 2) AS avg_click_to_purchase_s
        FROM f"""),
      "cascaded min-agg funnel; per-stage filtered shuffles, no event arrays"),

    // ---------------------------------------------------------------
    // Sketch-driven outlier trim: per-type p01/p99 bounds from the
    // mergeable quantile sketch (q71's machinery), broadcast back onto
    // the stream, keep the inliers, aggregate. The bounds stay at FULL
    // precision on both sides — every interpolation input is an exact
    // integer, so the cross-engine arithmetic is bit-identical and the
    // filter cannot disagree at the boundary.
    // ---------------------------------------------------------------
    Q("q83_outlier_trim",
      (s, dir) => {
        val e = events(s, dir)
        val bounds = graft.ops.QuantileSketch.estimate(
          graft.ops.QuantileSketch.sketchPartials(
            e, Seq("event_type"), "value", lo = 0.0, hi = 512.0, nBins = 256),
          Seq("event_type"), lo = 0.0, hi = 512.0, nBins = 256,
          qs = Seq("p01" -> 0.01, "p99" -> 0.99))
        e.join(broadcast(bounds), "event_type")
          .filter(col("value") >= col("p01") && col("value") <= col("p99"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_kept"),
            round(min("value"), 4).as("min_v"),
            round(max("value"), 4).as("max_v"),
            round(avg("value"), 2).as("avg_v"))
          .orderBy("event_type")
      },
      Some("""
        WITH b AS (
          SELECT event_type,
                 least(greatest(floor((value - 0.0) / 2.0), 0), 255)::BIGINT AS bin,
                 count(*) AS cnt
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        ), c AS (
          SELECT event_type, bin, cnt,
                 sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
                   ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(cnt) OVER (PARTITION BY event_type) AS total
          FROM b
        ), bounds AS (
          SELECT event_type,
                 min(CASE WHEN cum - cnt < total * 0.01 AND cum >= total * 0.01
                       THEN 0.0 + (bin + (total * 0.01 - (cum - cnt)) / cnt) * 2.0
                     END) AS p01,
                 min(CASE WHEN cum - cnt < total * 0.99 AND cum >= total * 0.99
                       THEN 0.0 + (bin + (total * 0.99 - (cum - cnt)) / cnt) * 2.0
                     END) AS p99
          FROM c GROUP BY 1
        )
        SELECT e.event_type, count(*) AS n_kept,
               round(min(e.value), 4) AS min_v, round(max(e.value), 4) AS max_v,
               round(avg(e.value), 2) AS avg_v
        FROM events e JOIN bounds USING (event_type)
        WHERE e.value >= p01 AND e.value <= p99
        GROUP BY 1 ORDER BY 1"""),
      "sketch bounds broadcast back as a filter; full-precision exact-integer interpolation"),

    // ---------------------------------------------------------------
    // Table profile (graft.ops.Profile): per-column row/null/distinct
    // counts in one scan — wide single-row agg, then stack() to long.
    // Exact distincts here (oracle parity at test scale); the approx
    // switch is the 100 TB path.
    // ---------------------------------------------------------------
    Q("q85_profile",
      (s, dir) => graft.ops.Profile.profile(lineitem(s, dir),
          Seq("l_orderkey", "l_partkey", "l_returnflag", "l_shipdate"))
        .orderBy("col_name"),
      Some("""
        SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
               count(*) - count(l_orderkey) AS n_nulls,
               count(DISTINCT l_orderkey) AS n_distinct FROM lineitem
        UNION ALL
        SELECT 'l_partkey', count(*), count(*) - count(l_partkey),
               count(DISTINCT l_partkey) FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
               count(DISTINCT l_returnflag) FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
               count(DISTINCT l_shipdate) FROM lineitem
        ORDER BY col_name"""),
      "one-scan data-quality profile; stack() unpivot of a single wide agg row"),

    // ---------------------------------------------------------------
    // Sliding (hopping) event-time windows: 1 h windows every 15 min —
    // Spark's window() explodes each event into width/slide windows
    // map-side (no self-join); the oracle derives the same window-start
    // set arithmetically from epoch micros.
    // ---------------------------------------------------------------
    Q("q86_sliding_window",
      (s, dir) => events(s, dir)
        .filter(col("ts").isNotNull && col("event_type") === "purchase")
        .groupBy(window(col("ts").cast("timestamp"), "1 hour", "15 minutes").as("win"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(
          date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("n"), col("sum_value"))
        .orderBy("window_start"),
      Some("""
        WITH e AS (
          SELECT epoch_ns(ts) // 1000 AS tsu, value
          FROM events WHERE ts IS NOT NULL AND event_type = 'purchase'
        ), w AS (
          SELECT unnest(range((tsu - 3600000000) // 900000000 + 1,
                              tsu // 900000000 + 1)) AS k,
                 value
          FROM e
        )
        SELECT strftime(make_timestamp(k * 900000000), '%Y-%m-%d %H:%M:%S')
                 AS window_start,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM w GROUP BY 1 ORDER BY 1"""),
      "hopping windows explode map-side into width/slide buckets; no self-join"),

    // ---------------------------------------------------------------
    // Event interval join, batch form of streaming.StreamingJoin (the
    // stream-stream twin is spec-pinned to this shape): purchases
    // within 10 min after a view, per user. Equi key (user) + range
    // predicate → plain sort-merge join; delay stats on exact integer
    // micros.
    // ---------------------------------------------------------------
    Q("q87_event_interval_join",
      (s, dir) => {
        val e = events(s, dir).select(col("user_id"), col("event_type"),
            expr("unix_micros(cast(ts as timestamp))").as("tsu"))
          .filter(col("tsu").isNotNull)
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("tsu").as("view_ts"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("tsu").as("buy_ts"))
        v.join(p, Seq("user_id"))
          .filter(col("buy_ts") >= col("view_ts") &&
            col("buy_ts") <= col("view_ts") + 600L * 1000000L)
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("user_id")).as("n_users"),
            round(avg(col("buy_ts") - col("view_ts")) / 1000000.0, 2)
              .as("avg_delay_s"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ns(ts) // 1000 AS tsu
          FROM events WHERE ts IS NOT NULL
        ), v AS (SELECT user_id, tsu AS view_ts FROM e WHERE event_type = 'view'),
        p AS (SELECT user_id, tsu AS buy_ts FROM e WHERE event_type = 'purchase')
        SELECT count(*) AS n_pairs, count(DISTINCT v.user_id) AS n_users,
               round(avg(buy_ts - view_ts) / 1000000.0, 2) AS avg_delay_s
        FROM v JOIN p ON p.user_id = v.user_id
         AND buy_ts >= view_ts AND buy_ts <= view_ts + 600000000"""),
      "keyed interval join (equi + range): the batch twin of StreamingJoin"),

    // ---------------------------------------------------------------
    // ORC source round-trip: events written once per sf dir as ORC
    // (mtime-memoized like q72's IVF index), read back through the
    // ORC reader, aggregated. The oracle reads the SAME rows from
    // parquet — a green row proves the ORC write+read path is
    // byte-faithful for every column type involved.
    // ---------------------------------------------------------------
    Q("q88_orc_roundtrip",
      (s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val stamp = new java.io.File(dir, "events.parquet").lastModified()
        val orcDir = new java.io.File(
          new java.io.File(sys.props("user.dir"), "target"),
          s"graft_orc_events_${tag}_$stamp").getAbsolutePath
        ReferenceQueries.synchronized {
          if (!new java.io.File(s"$orcDir/_SUCCESS").exists())
            events(s, dir).write.mode("overwrite").orc(orcDir)
        }
        s.read.orc(orcDir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
            round(sum(col("value")), 2).as("sum_value"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1 ORDER BY 1"""),
      "ORC write+read == parquet oracle: source-format fidelity check"),

    // ---------------------------------------------------------------
    // JSON source/sink fidelity, same shape as the ORC round-trip:
    // events write to JSON lines and read back with an explicit schema
    // (timestamps as ISO strings, doubles shortest-round-trip), then
    // the aggregate must hash-match the oracle computed from the
    // ORIGINAL parquet — completing the csv/parquet/orc/json matrix.
    // ---------------------------------------------------------------
    Q("q95_json_roundtrip",
      (s, dir) => {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val stamp = new java.io.File(dir, "events.parquet").lastModified()
        val jsonDir = new java.io.File(
          new java.io.File(sys.props("user.dir"), "target"),
          s"graft_json_events_${tag}_$stamp").getAbsolutePath
        val ev = events(s, dir)
        ReferenceQueries.synchronized {
          if (!new java.io.File(s"$jsonDir/_SUCCESS").exists())
            ev.write.mode("overwrite").json(jsonDir)
        }
        s.read.schema(ev.schema).json(jsonDir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
            round(sum(col("value")), 2).as("sum_value"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1 ORDER BY 1"""),
      "JSON write+read == parquet oracle: source-format fidelity check"),

    // ---------------------------------------------------------------
    // Avro source/sink fidelity, completing the format matrix
    // (csv=q44, parquet=everything, orc=q88, json=q95). Spark 4 ships
    // the full Avro FileFormat inside spark-sql but does NOT register
    // the `avro` short name on this classpath — the fully-qualified
    // class is the supported spelling (AvroProbeSpec pins both
    // directions). Same aggregate + oracle as q88/q95: a green row
    // proves write+read fidelity for longs, strings, doubles and
    // timestamps through Avro's logical types.
    // ---------------------------------------------------------------
    Q("q105_avro_roundtrip",
      (s, dir) => {
        val avroFmt = "org.apache.spark.sql.avro.AvroFileFormat"
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val stamp = new java.io.File(dir, "events.parquet").lastModified()
        val avroDir = new java.io.File(
          new java.io.File(sys.props("user.dir"), "target"),
          s"graft_avro_events_${tag}_$stamp").getAbsolutePath
        ReferenceQueries.synchronized {
          if (!new java.io.File(s"$avroDir/_SUCCESS").exists())
            events(s, dir).write.format(avroFmt).mode("overwrite").save(avroDir)
        }
        s.read.format(avroFmt).load(avroDir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
            round(sum(col("value")), 2).as("sum_value"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1 ORDER BY 1"""),
      "Avro write+read == parquet oracle: source-format fidelity check"),

    // ---------------------------------------------------------------
    // Time-grid gap fill — the sensor-series operator the reference's
    // presence/summary tables gesture at: build each user's complete
    // day grid (sequence over the min..max date span), left-join the
    // actual daily aggregate, and forward-fill gaps with the last
    // observed value (window last(ignoreNulls)). One shuffle for the
    // daily agg, one for the window — the grid explode is map-side,
    // and at 100 TB the window partitions by user so state is one
    // running value per partition.
    // ---------------------------------------------------------------
    Q("q128_gap_fill",
      (s, dir) => {
        val daily = events(s, dir)
          .filter(col("user_id") < 10 && col("ts").isNotNull)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            col("value").cast("double").as("v"))
          .groupBy("user_id", "day")
          .agg(round(sum("v"), 4).as("day_sum"))
        graft.ext.TimeSeries.fillForward(
            graft.ext.TimeSeries.dayGrid(daily, Seq("user_id"), "day"),
            Seq("user_id"), "day", "day_sum", "filled_sum")
          .withColumn("is_gap", col("day_sum").isNull)
          .select(col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("filled_sum"), col("is_gap"))
          .orderBy("user_id", "day")
      },
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 round(sum(value::DOUBLE), 4) AS day_sum
          FROM events WHERE user_id < 10 AND ts IS NOT NULL
          GROUP BY 1, 2),
        b AS (SELECT user_id, min(day) AS lo, max(day) AS hi
              FROM daily GROUP BY 1),
        grid AS (SELECT user_id,
                        unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
                 FROM b),
        j AS (SELECT g.user_id, g.day, d.day_sum
              FROM grid g LEFT JOIN daily d USING (user_id, day))
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
               last_value(day_sum IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum,
               (day_sum IS NULL) AS is_gap
        FROM j ORDER BY user_id, day"""),
      "complete day grid per user + forward-fill of gaps with the last observed daily value"),

    // ---------------------------------------------------------------
    // CUBE: all four grouping combinations of (event_type, user
    // bucket) in one pass — q21's rollup generalized to the full
    // lattice. SQL resolution path for the same reason as q21 (the
    // Expand node trips the ambiguous-self-join detector under the
    // Dataset API), sentinels instead of nulls so sort keys stay
    // non-nullable on both engines.
    // ---------------------------------------------------------------
    Q("q129_cube",
      (s, dir) => {
        events(s, dir)
          .select(col("event_type"), (col("user_id") % 10).as("bucket"),
            col("value"))
          .createOrReplaceTempView("q129_cube_input")
        s.sql("""
          SELECT coalesce(event_type, 'ALL') AS event_type,
                 coalesce(bucket, -1) AS bucket,
                 count(*) AS n,
                 round(sum(value), 2) AS sum_value
          FROM q129_cube_input
          GROUP BY CUBE (event_type, bucket)
          ORDER BY event_type, bucket""")
      },
      Some("""
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(user_id % 10, -1) AS bucket,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY CUBE (event_type, (user_id % 10))
        ORDER BY event_type, bucket"""),
      "full grouping lattice in one Expand pass — rollup's generalization"),

    // ---------------------------------------------------------------
    // Linear interpolation of series gaps — pandas' interpolate() (the
    // reference engine's native idiom) as a distributed plan: q128's
    // grid + two opposing ignoreNulls windows give each gap its
    // bracketing observations, and the fill is prev + (next − prev) ·
    // elapsed/span. Same scale shape as q128: two window passes
    // partitioned by user, no driver loops.
    // ---------------------------------------------------------------
    Q("q130_interpolate",
      (s, dir) => {
        val daily = events(s, dir)
          .filter(col("user_id") < 10 && col("ts").isNotNull)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            col("value").cast("double").as("v"))
          .groupBy("user_id", "day")
          .agg(round(sum("v"), 4).as("day_sum"))
        graft.ext.TimeSeries.interpolateLinear(
            graft.ext.TimeSeries.dayGrid(daily, Seq("user_id"), "day"),
            Seq("user_id"), "day", "day_sum", "interp_sum")
          .withColumn("was_gap", col("day_sum").isNull)
          .select(col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("interp_sum"), col("was_gap"))
          .orderBy("user_id", "day")
      },
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 round(sum(value::DOUBLE), 4) AS day_sum
          FROM events WHERE user_id < 10 AND ts IS NOT NULL
          GROUP BY 1, 2),
        b AS (SELECT user_id, min(day) AS lo, max(day) AS hi
              FROM daily GROUP BY 1),
        grid AS (SELECT user_id,
                        unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
                 FROM b),
        j AS (SELECT g.user_id, g.day, d.day_sum
              FROM grid g LEFT JOIN daily d USING (user_id, day)),
        w AS (SELECT user_id, day, day_sum,
                     last_value(day_sum IGNORE NULLS) OVER wp AS pv,
                     last_value(CASE WHEN day_sum IS NOT NULL THEN day END
                                IGNORE NULLS) OVER wp AS pd,
                     first_value(day_sum IGNORE NULLS) OVER wn AS nv,
                     first_value(CASE WHEN day_sum IS NOT NULL THEN day END
                                 IGNORE NULLS) OVER wn AS nd
              FROM j
              WINDOW wp AS (PARTITION BY user_id ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     wn AS (PARTITION BY user_id ORDER BY day
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
               round(CASE WHEN day_sum IS NOT NULL THEN day_sum
                     ELSE pv + (nv - pv) * ((day - pd)::DOUBLE / (nd - pd)::DOUBLE)
                     END, 4) AS interp_sum,
               (day_sum IS NULL) AS was_gap
        FROM w ORDER BY user_id, day"""),
      "pandas interpolate() as a plan: bracketing observations via opposing ignoreNulls windows, linear fill"),

    // ---------------------------------------------------------------
    // EWMA — pandas ewm(alpha).mean() (adjust=true) in CLOSED form:
    // ewma_t = Σ (1-α)^(t-i)·x_i / Σ (1-α)^(t-i) over the ordered
    // prefix, a windowed collect_list folded by codegen'd
    // transform/aggregate — the recursive smoother as a pure plan,
    // deterministic because the window order fixes the fold. The
    // oracle rebuilds every prefix fold with a DuckDB windowed list +
    // comprehension.
    // ---------------------------------------------------------------
    Q("q132_ewma",
      (s, dir) => {
        val daily = events(s, dir)
          .filter(col("user_id") < 10 && col("ts").isNotNull)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            col("value").cast("double").as("v"))
          .groupBy("user_id", "day")
          .agg(round(sum("v"), 4).as("day_sum"))
        graft.ext.TimeSeries.ewma(daily, Seq("user_id"), "day",
            "day_sum", alpha = 0.3, "ewma_sum")
          .select(col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("day_sum"), col("ewma_sum"))
          .orderBy("user_id", "day")
      },
      Some("""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 round(sum(value::DOUBLE), 4) AS day_sum
          FROM events WHERE user_id < 10 AND ts IS NOT NULL
          GROUP BY 1, 2),
        l AS (SELECT user_id, day, day_sum,
                     list(day_sum) OVER (PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
              FROM daily)
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day, day_sum,
               round(list_sum([p[i::INT] * power(0.7, (length(p) - i)::DOUBLE)
                               for i in range(1, length(p) + 1)])
                     / list_sum([power(0.7, (length(p) - i)::DOUBLE)
                                 for i in range(1, length(p) + 1)]), 4) AS ewma_sum
        FROM l ORDER BY user_id, day"""),
      "pandas ewm().mean() closed form: prefix fold via windowed collect_list + higher-order aggregate")
  )
}
