package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Bpe, Graph, TimeSeries}

/** Advanced-analytics tier (round 8): robust anomaly detection,
  * changepoints, cohort retention, link analysis, BPE tokenizer
  * training, association rules, trend and seasonality — the
  * statistical layer a monitoring/curation pipeline runs on top of the
  * core engine. Every entry is DuckDB-oracled; float outputs are
  * rounded on both sides and every query carries a total ORDER BY.
  */
object AnalyticsQueries {

  private def events(s: SparkSession, dir: String) = Tables(s, dir, "events")

  /** Per-user daily value sums on the INTEGER TICK GRID (1 tick =
    * 1e-4): every downstream statistic — median/MAD, moments, prefix
    * sums — becomes exact integer arithmetic, identical across
    * engines BY CONSTRUCTION instead of by rounding luck. (The float
    * variant died at sf0.1: DuckDB's and Spark's median interpolation
    * and stddev accumulation differ at the ulp, and with 1500 users
    * one of them always lands on a round-to-4 boundary.) Scores and
    * ratios built on ticks are scale-invariant, so outputs keep their
    * natural units. */
  private def dailyTicks(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("value").cast("double").as("v"))
      .groupBy("user_id", "day")
      .agg(round(sum("v") * 10000).cast("long").as("yi"))

  private val sqlDaily = """
          SELECT user_id, CAST(ts AS DATE) AS day,
                 round(sum(value::DOUBLE) * 10000)::BIGINT AS yi
          FROM events WHERE ts IS NOT NULL
          GROUP BY 1, 2"""

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------
    // Robust outlier detection — the Iglewicz–Hoaglin modified
    // z-score (0.6745·(x − median)/MAD) per user series, on the tick
    // grid: median/MAD of integers interpolate to exact half/quarter
    // ticks on both engines, so the score is bit-identical and the
    // |z| > 2.5 flag can't flip on ulps (the score itself is
    // scale-invariant, so ticks cancel). Three shuffles on user_id,
    // all map-side-combined.
    // ---------------------------------------------------------------
    Q("q133_mad_outliers",
      (s, dir) => {
        // score in z-TEN-THOUSANDTHS via round-to-INTEGER — the one
        // portable rounding: on the tick grid z can be an exact
        // decimal tie (this data produces z = 3.56775 exactly), and
        // round(x, 4) of a non-representable tie splits between
        // engines (BigDecimal half-up vs multiply-based). Integer
        // ties ARE representable, so round() agrees everywhere.
        // 6745·diff stays exact in 64 bits; a mathematical tie k+0.5
        // divides out exactly, and a non-tie sits ≥ 1/(4·mad) from
        // the boundary — far above double noise.
        val daily = dailyTicks(s, dir)
        val med = daily.groupBy("user_id").agg(median(col("yi")).as("med"))
        val d = daily.join(med, "user_id")
          .withColumn("adev", abs(col("yi") - col("med")))
        val mad = d.groupBy("user_id").agg(median(col("adev")).as("mad"))
        d.join(mad, "user_id")
          .withColumn("zt", round(lit(6745.0) * (col("yi") - col("med")) /
            when(col("mad") =!= 0.0, col("mad"))))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_days"),
            count(when(abs(col("zt")) > 25000, 1)).as("n_outliers"),
            round(max(abs(col("zt"))) / 10000, 4).as("max_abs_z"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH daily AS ($sqlDaily),
        m AS (SELECT user_id, median(yi) AS med FROM daily GROUP BY 1),
        d AS (SELECT daily.*, med, abs(yi - med) AS adev
              FROM daily JOIN m USING (user_id)),
        m2 AS (SELECT user_id, median(adev) AS mad FROM d GROUP BY 1),
        z AS (SELECT d.user_id,
                     round(6745 * (yi - med) / nullif(mad, 0)) AS zt
              FROM d JOIN m2 USING (user_id))
        SELECT user_id, count(*) AS n_days,
               count(CASE WHEN abs(zt) > 25000 THEN 1 END) AS n_outliers,
               round(max(abs(zt)) / 10000, 4) AS max_abs_z
        FROM z GROUP BY 1 ORDER BY 1"""),
      "Iglewicz-Hoaglin modified z per series: exact-rank median/MAD on the tick grid, integer-tie-safe flags"),

    // ---------------------------------------------------------------
    // CUSUM changepoint detection (Page 1954) as a PURE PLAN: the
    // recursion S_t = max(0, S_{t-1} + z_t − k) equals
    // C_t − min(0, min_{j≤t} C_j) over prefix sums C — two ordered
    // window passes, no recursion, no driver loop. Deviations are
    // standardized against per-user mean/stddev ROUNDED to 4 decimals
    // first, so both engines fold identical inputs. k = 0.25
    // allowance, h = 3.0 threshold, both sides detected (negative
    // side = CUSUM of −z).
    // ---------------------------------------------------------------
    Q("q134_cusum_changepoints",
      (s, dir) => {
        val daily = dailyTicks(s, dir)
        // mean/stddev from exact integer moments (sums of ticks and
        // squared ticks are exact in 64 bits), folded through ONE
        // pinned expression shape both engines evaluate identically —
        // the library stddev_pop's accumulation order is not portable
        val st = daily.groupBy("user_id")
          .agg(count(lit(1)).cast("double").as("n"),
            sum("yi").cast("double").as("sx"),
            sum(col("yi") * col("yi")).cast("double").as("sxx"))
          .withColumn("m", col("sx") / col("n"))
          .withColumn("sd",
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / col("n")))
        // standardized deviation quantized back to integer ticks:
        // the CUSUM fold below is then EXACT integer arithmetic
        val z = daily.join(st, "user_id")
          .withColumn("z",
            round((col("yi") - col("m")) / when(col("sd") =!= 0.0, col("sd"))
              * 10000).cast("long"))
          .withColumn("zn", -col("z"))
        val sp = TimeSeries.cusum(z, Seq("user_id"), "day", "z", 2500.0, "sp")
        val both = TimeSeries.cusum(sp, Seq("user_id"), "day", "zn", 2500.0, "sn")
        both.groupBy("user_id")
          .agg(count(lit(1)).as("n_days"),
            count(when(col("sp") > 30000.0, 1)).as("n_pos"),
            count(when(col("sn") > 30000.0, 1)).as("n_neg"),
            round(max("sp") / 10000.0, 4).as("max_pos"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH daily AS ($sqlDaily),
        st AS (SELECT user_id, count(*)::DOUBLE AS n,
                      sum(yi)::DOUBLE AS sx, sum(yi * yi)::DOUBLE AS sxx
               FROM daily GROUP BY 1),
        z AS (SELECT daily.user_id, day,
                     round((yi - sx / n)
                       / nullif(sqrt((sxx - sx * sx / n) / n), 0)
                       * 10000)::BIGINT AS z
              FROM daily JOIN st USING (user_id)),
        c AS (SELECT user_id, day, sum(z - 2500) OVER w AS cp,
                     sum(-z - 2500) OVER w AS cn
              FROM z WINDOW w AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        s AS (SELECT user_id, cp - least(0, min(cp) OVER w) AS sp,
                     cn - least(0, min(cn) OVER w) AS sn
              FROM c WINDOW w AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT user_id, count(*) AS n_days,
               count(CASE WHEN sp > 30000 THEN 1 END) AS n_pos,
               count(CASE WHEN sn > 30000 THEN 1 END) AS n_neg,
               round(max(sp)::DOUBLE / 10000, 4) AS max_pos
        FROM s GROUP BY 1 ORDER BY 1"""),
      "Page's CUSUM in closed form: prefix sum minus running min, folded in exact integer ticks"),

    // ---------------------------------------------------------------
    // Cohort retention triangle — users bucketed by the week of their
    // FIRST qualifying action (purchase with value > 90), counted in
    // each subsequent week they stay active. Weeks are day-offsets
    // from a fixed anchor (engine-neutral: no dayofweek/ISO-week
    // semantics to disagree on). Pure integers — no float risk. Two
    // shuffles: first-week agg, then the (cohort, offset) count.
    // ---------------------------------------------------------------
    Q("q135_cohort_retention",
      (s, dir) => {
        val d = events(s, dir)
          .filter(col("ts").isNotNull && col("event_type") === "purchase" &&
            col("value") > 90)
          .select(col("user_id"),
            floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7)
              .as("wk"))
        val f = d.groupBy("user_id").agg(min("wk").as("cohort"))
        d.join(f, "user_id")
          .groupBy(col("cohort"), (col("wk") - col("cohort")).as("week_offset"))
          .agg(count_distinct(col("user_id")).as("n_active"))
          .orderBy("cohort", "week_offset")
      },
      Some("""
        WITH d AS (
          SELECT user_id,
                 ((CAST(ts AS DATE) - DATE '2024-01-01') // 7)::BIGINT AS wk
          FROM events
          WHERE ts IS NOT NULL AND event_type = 'purchase' AND value > 90),
        f AS (SELECT user_id, min(wk) AS cohort FROM d GROUP BY 1)
        SELECT cohort, wk - cohort AS week_offset,
               count(DISTINCT d.user_id) AS n_active
        FROM d JOIN f USING (user_id) GROUP BY 1, 2 ORDER BY 1, 2"""),
      "retention triangle: first-qualifying-week cohorts x weekly activity offsets"),

    // ---------------------------------------------------------------
    // PageRank by power iteration over the customer–supplier trade
    // graph (distinct pairs through orders⋈lineitem, encoded
    // undirected so no node dangles). Each Spark iteration is one
    // edge⋈rank join + one groupBy(dst); ranks are rounded per
    // iteration so both engines fold the identical fixpoint — the
    // oracle unrolls the same three iterations as CTEs. The only
    // driver scalar is |V|.
    // ---------------------------------------------------------------
    Q("q136_pagerank",
      (s, dir) => {
        val e0 = Tables(s, dir, "orders")
          .join(Tables(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .filter(col("o_custkey") < 200 && col("l_suppkey") < 100)
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
          .distinct()
        val edges = e0.select(col("c").as("src"), (col("sp") + 100000L).as("dst"))
          .unionByName(e0.select((col("sp") + 100000L).as("src"), col("c").as("dst")))
        Graph.pageRank(edges, iters = 3, damping = 0.85, scale = 8)
          .select(col("node"), round(col("rank"), 6).as("rank"))
          .orderBy(desc("rank"), asc("node"))
          .limit(20)
      },
      Some("""
        WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                    WHERE o_custkey < 200 AND l_suppkey < 100),
        e AS (SELECT c AS src, sp + 100000 AS dst FROM e0
              UNION ALL SELECT sp + 100000, c FROM e0),
        n AS (SELECT DISTINCT src AS node FROM e),
        deg AS (SELECT src, count(*)::DOUBLE AS d FROM e GROUP BY 1),
        r0 AS (SELECT node, 1.0 / (SELECT count(*) FROM n) AS rank FROM n),
        it1 AS (SELECT n.node, round(0.15 / (SELECT count(*) FROM n)
                  + 0.85 * coalesce(s.cs, 0), 8) AS rank
                FROM n LEFT JOIN (SELECT e.dst AS node, sum(r.rank / deg.d) AS cs
                                  FROM e JOIN r0 r ON e.src = r.node
                                  JOIN deg ON e.src = deg.src GROUP BY 1) s
                USING (node)),
        it2 AS (SELECT n.node, round(0.15 / (SELECT count(*) FROM n)
                  + 0.85 * coalesce(s.cs, 0), 8) AS rank
                FROM n LEFT JOIN (SELECT e.dst AS node, sum(r.rank / deg.d) AS cs
                                  FROM e JOIN it1 r ON e.src = r.node
                                  JOIN deg ON e.src = deg.src GROUP BY 1) s
                USING (node)),
        it3 AS (SELECT n.node, round(0.15 / (SELECT count(*) FROM n)
                  + 0.85 * coalesce(s.cs, 0), 8) AS rank
                FROM n LEFT JOIN (SELECT e.dst AS node, sum(r.rank / deg.d) AS cs
                                  FROM e JOIN it2 r ON e.src = r.node
                                  JOIN deg ON e.src = deg.src GROUP BY 1) s
                USING (node))
        SELECT node, round(rank, 6) AS rank
        FROM it3 ORDER BY rank DESC, node LIMIT 20"""),
      "3-iteration PageRank, per-iteration rounded fixpoint == unrolled-CTE oracle"),

    // ---------------------------------------------------------------
    // BPE tokenizer training, step 1: adjacent symbol-pair counts
    // over the word-frequency table (Sennrich et al. 2016). Training
    // runs on DISTINCT words weighted by frequency — the compression
    // that makes corpus-scale BPE tractable — so the pair explode is
    // map-side and the only shuffles are the two groupBys. Exact
    // integers: no float risk anywhere.
    // ---------------------------------------------------------------
    Q("q137_bpe_pairs",
      (s, dir) => {
        Bpe.pairCounts(Bpe.wordCounts(Tables(s, dir, "documents"), "text"))
          .orderBy(desc("n"), asc("pair"))
          .limit(30)
      },
      Some("""
        WITH words AS (
          SELECT w, count(*) AS cnt FROM (
            SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
            FROM documents) t
          WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
          GROUP BY 1),
        pairs AS (
          SELECT substr(w, i, 2) AS pair, sum(cnt)::BIGINT AS n
          FROM words, unnest(range(1, length(w))) AS u(i)
          GROUP BY 1)
        SELECT pair, n FROM pairs ORDER BY n DESC, pair LIMIT 30"""),
      "BPE merge-candidate counts: frequency-weighted adjacent pairs over the distinct-word table"),

    // ---------------------------------------------------------------
    // BPE training, step 2: apply the learned top merge (as a literal
    // replace — greedy left-to-right non-overlapping, exactly BPE's
    // application order, with the merged pair renamed to a single
    // marker char) and recount pairs. Pairs containing the marker ARE
    // the second-generation merge candidates. Proves the train loop's
    // core (count → argmax → rewrite → recount) end-to-end against an
    // oracle that replays the same two steps in SQL.
    // ---------------------------------------------------------------
    Q("q138_bpe_second_merge",
      (s, dir) => {
        val words = Bpe.wordCounts(Tables(s, dir, "documents"), "text")
          .persist()
        val top1 = Bpe.pairCounts(words)
          .orderBy(desc("n"), asc("pair")).limit(1)
          .select(col("pair").as("__m1"))
        val w2 = words.crossJoin(broadcast(top1))
          .withColumn("w", replace(col("w"), col("__m1"), lit("_")))
        val out = Bpe.pairCounts(w2)
          .orderBy(desc("n"), asc("pair"))
          .limit(30)
        out.collect() // materialize before unpersisting the shared parent
        words.unpersist()
        out
      },
      Some("""
        WITH words AS (
          SELECT w, count(*) AS cnt FROM (
            SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
            FROM documents) t
          WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
          GROUP BY 1),
        p1 AS (SELECT substr(w, i, 2) AS pair, sum(cnt)::BIGINT AS n
               FROM words, unnest(range(1, length(w))) AS u(i) GROUP BY 1),
        m1 AS (SELECT pair FROM p1 ORDER BY n DESC, pair LIMIT 1),
        w2 AS (SELECT replace(w, (SELECT pair FROM m1), '_') AS w, cnt
               FROM words),
        p2 AS (SELECT substr(w, i, 2) AS pair, sum(cnt)::BIGINT AS n
               FROM w2, unnest(range(1, length(w))) AS u(i)
               WHERE length(w) >= 2 GROUP BY 1)
        SELECT pair, n FROM p2 ORDER BY n DESC, pair LIMIT 30"""),
      "BPE loop core oracled: argmax merge applied (greedy literal replace), second-round candidates"),

    // ---------------------------------------------------------------
    // Association rules over rare events (value > 97): per-user
    // distinct event-type sets self-joined into ordered pairs, scored
    // by support and lift. The self-join is an equi-join on user_id
    // (never all-pairs across users); the type alphabet bounds the
    // output. Lift denominators stay exact integers until one final
    // rounded division.
    // ---------------------------------------------------------------
    Q("q140_cooccurrence_lift",
      (s, dir) => {
        val ut = events(s, dir).filter(col("value") > 97)
          .select("user_id", "event_type").distinct().persist()
        val nUsers = ut.select("user_id").distinct().count()
        val c = ut.groupBy("event_type").agg(count(lit(1)).as("n_t"))
        val a = ut.toDF("user_id", "t1")
        val b = ut.toDF("user_id", "t2")
        val out = a.join(b, Seq("user_id")).filter(col("t1") < col("t2"))
          .groupBy("t1", "t2").agg(count(lit(1)).as("n_ab"))
          .join(c.select(col("event_type").as("t1"), col("n_t").as("na")), "t1")
          .join(c.select(col("event_type").as("t2"), col("n_t").as("nb")), "t2")
          // ratios of small integers CAN tie exactly on the decimal
          // grid — quantize by round-to-integer (portable on ties,
          // see q133), divide by the grid size last
          .select(col("t1"), col("t2"), col("n_ab"),
            (round(col("n_ab").cast("double") * 1000000 / nUsers) / 1000000)
              .as("support"),
            (round(col("n_ab").cast("double") * nUsers * 10000 /
              (col("na") * col("nb"))) / 10000).as("lift"))
          .orderBy("t1", "t2")
        out.collect()
        ut.unpersist()
        out
      },
      Some("""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events
                    WHERE value > 97),
        nu AS (SELECT count(DISTINCT user_id) AS n FROM ut),
        c AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY 1),
        p AS (SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_ab
              FROM ut a JOIN ut b
                ON a.user_id = b.user_id AND a.event_type < b.event_type
              GROUP BY 1, 2)
        SELECT t1, t2, n_ab,
               round(n_ab::DOUBLE * 1000000 / (SELECT n FROM nu)) / 1000000
                 AS support,
               round(n_ab::DOUBLE * (SELECT n FROM nu) * 10000
                     / (ca.n_t * cb.n_t)) / 10000 AS lift
        FROM p JOIN c ca ON ca.event_type = t1
               JOIN c cb ON cb.event_type = t2
        ORDER BY t1, t2"""),
      "market-basket pairs on the user equi-join: support + lift, never all-pairs across users"),

    // ---------------------------------------------------------------
    // Per-series OLS trend — slope/intercept of daily sums against
    // the day index, computed from EXACT integer moments (n, Σx, Σx²,
    // Σy, Σxy over ticks; the numerator/denominator stay in 64-bit
    // integers) and divided once through a pinned expression — the
    // portable form of regr_slope/regr_intercept, whose library
    // accumulation orders differ between engines. One aggregate pass
    // per user, no window, no collect.
    // ---------------------------------------------------------------
    Q("q141_trend_slope",
      (s, dir) => {
        val mo = dailyTicks(s, dir)
          .withColumn("x", datediff(col("day"), lit("2024-01-01")).cast("long"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"),
            sum("yi").as("sy"), sum(col("x") * col("yi")).as("sxy"))
        val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        val slopeT = num / when(den =!= 0.0, den)
        // slope/intercept are TICK-valued rationals, so quantize by
        // round-to-INTEGER ticks (portable even on exact decimal
        // ties — see q133) and divide by the tick size last
        mo.select(col("user_id"), col("n").as("n_days"),
            (round(slopeT) / 10000).as("slope"),
            (round((col("sy").cast("double") - slopeT * col("sx").cast("double"))
              / col("n").cast("double")) / 10000).as("icept"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH daily AS ($sqlDaily),
        mo AS (SELECT user_id, count(*) AS n,
                      sum(x) AS sx, sum(x * x) AS sxx,
                      sum(yi) AS sy, sum(x * yi) AS sxy
               FROM (SELECT user_id, yi,
                            (day - DATE '2024-01-01')::BIGINT AS x
                     FROM daily) t
               GROUP BY 1)
        SELECT user_id, n AS n_days,
               round((n * sxy - sx * sy)::DOUBLE
                     / nullif((n * sxx - sx * sx)::DOUBLE, 0)) / 10000
                 AS slope,
               round((sy::DOUBLE - (n * sxy - sx * sy)::DOUBLE
                        / nullif((n * sxx - sx * sx)::DOUBLE, 0) * sx::DOUBLE)
                     / n::DOUBLE) / 10000 AS icept
        FROM mo ORDER BY 1"""),
      "per-series OLS trend from exact integer moments — portable regr_slope, one aggregate pass"),

    // ---------------------------------------------------------------
    // Day-of-week seasonality by moving-average decomposition: gaps
    // zero-filled on the day grid (no activity = 0), trend = centered
    // 7-day average (full frames only), seasonal index = mean ratio
    // to trend per anchor-relative weekday — engine-neutral dow, no
    // dayofweek() semantics to disagree on. Two window passes + one
    // tiny aggregate.
    // ---------------------------------------------------------------
    Q("q142_dow_seasonality",
      (s, dir) => {
        val daily = dailyTicks(s, dir).filter(col("user_id") < 30)
        // ticks again: the 7-day trend is then (exact integer sum)/7
        // and each ratio an identical IEEE division on both engines
        val g = TimeSeries.dayGrid(daily, Seq("user_id"), "day")
          .withColumn("v", coalesce(col("yi"), lit(0L)))
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(-3, 3)
        val t = g.withColumn("trend",
            when(count(lit(1)).over(w) === 7,
              sum("v").over(w).cast("double") / 7))
          .filter(col("trend").isNotNull)
          .withColumn("ratio",
            col("v").cast("double") / when(col("trend") =!= 0.0, col("trend")))
        t.groupBy((datediff(col("day"), lit("2024-01-01")) % 7).as("dow"))
          .agg(count(col("ratio")).as("n_obs"),
            round(avg("ratio"), 4).as("seasonal_idx"))
          .orderBy("dow")
      },
      Some(s"""
        WITH daily0 AS ($sqlDaily),
        daily AS (SELECT * FROM daily0 WHERE user_id < 30),
        b AS (SELECT user_id, min(day) AS lo, max(day) AS hi
              FROM daily GROUP BY 1),
        grid AS (SELECT user_id,
                        unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
                 FROM b),
        g AS (SELECT grid.user_id, grid.day, coalesce(yi, 0) AS v
              FROM grid LEFT JOIN daily USING (user_id, day)),
        t AS (SELECT user_id, day, v,
                     CASE WHEN count(*) OVER w = 7
                          THEN sum(v) OVER w :: DOUBLE / 7 END AS trend
              FROM g WINDOW w AS (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING))
        SELECT (day - DATE '2024-01-01') % 7 AS dow,
               count(v::DOUBLE / nullif(trend, 0)) AS n_obs,
               round(avg(v::DOUBLE / nullif(trend, 0)), 4) AS seasonal_idx
        FROM t WHERE trend IS NOT NULL GROUP BY 1 ORDER BY 1"""),
      "moving-average decomposition: zero-filled grid, exact 7-day trend on ticks, per-dow seasonal index"),

    // ---------------------------------------------------------------
    // BPE training END-TO-END: learn an 8-merge vocabulary on the
    // corpus (each step = distributed pair count + argmax + literal
    // rewrite), then tokenize the corpus with it and report the top
    // token frequencies with aliases rendered back to surface text.
    // The oracle UNROLLS the identical 8 training steps as generated
    // CTEs (count_i → argmax_i → rewrite_i) and re-renders tokens via
    // reverse-order replaces — the full train→tokenize→count loop is
    // hash-checked, not just one step. Exact integers throughout.
    // ---------------------------------------------------------------
    Q("q143_bpe_train_tokens",
      (s, dir) => {
        val words = Bpe.wordCounts(Tables(s, dir, "documents"), "text")
        val (merges, fin) = Bpe.learnMerges(words, 8)
        fin
          .select(col("cnt"),
            explode(filter(split(col("w"), ""), c => length(c) > 0)).as("sym"))
          .groupBy("sym").agg(sum("cnt").as("n"))
          // symbol -> surface is bijective, so grouping before the
          // (pure, chained-replace) rendering is equivalent and cheaper
          .select(Bpe.expandAliases(col("sym"), merges).as("token"), col("n"))
          .orderBy(desc("n"), asc("token"))
          .limit(30)
      },
      Some(bpeTrainOracle(8)),
      "8-merge BPE vocabulary learned distributed == 8 unrolled train steps in SQL; corpus token frequencies"),

    // ---------------------------------------------------------------
    // Frequent event sequences: per-user trigrams of consecutive
    // event types (window lead over the time-ordered stream, tie-
    // broken on event_id for a total order), counted corpus-wide —
    // the n-gram mining step behind next-event models and funnel
    // discovery. One window shuffle on user_id + one count shuffle.
    // ---------------------------------------------------------------
    Q("q144_event_trigrams",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, dir).filter(col("ts").isNotNull)
          .select(col("user_id"), col("event_type"),
            lead("event_type", 1).over(w).as("t2"),
            lead("event_type", 2).over(w).as("t3"))
          .filter(col("t3").isNotNull)
          .groupBy(concat_ws(">", col("event_type"), col("t2"), col("t3"))
            .as("trigram"))
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("trigram"))
          .limit(20)
      },
      Some("""
        WITH s AS (SELECT user_id, event_type,
                          lead(event_type, 1) OVER w AS t2,
                          lead(event_type, 2) OVER w AS t3
                   FROM events WHERE ts IS NOT NULL
                   WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT event_type || '>' || t2 || '>' || t3 AS trigram,
               count(*) AS n
        FROM s WHERE t3 IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20"""),
      "per-user consecutive event-type trigrams, corpus-wide counts — sequence mining on one window pass"),

    // ---------------------------------------------------------------
    // Triangle counting on the co-purchase projection: customers
    // (bucketed mod 97 so the graph is scale-comparable at every sf)
    // share an edge when a rare high-quantity purchase connects them
    // through a supplier; triangles enumerate via the standard ordered
    // two-join (u<v<w — each triangle found exactly once, no
    // symmetric duplicates), and each contributes to its three
    // corners. Every join is an equi-join; the orientation bound is
    // what keeps the join feasible on skewed degree distributions.
    // ---------------------------------------------------------------
    Q("q145_triangle_count",
      (s, dir) => {
        val cs = Tables(s, dir, "orders")
          .join(Tables(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_quantity") >= 49 && col("o_totalprice") < 50000)
          .select((col("o_custkey") % 97).as("c"), (col("l_suppkey") % 31).as("sp"))
          .distinct()
        val e = cs.toDF("u", "sp").join(cs.toDF("v", "sp2"),
            col("sp") === col("sp2") && col("u") < col("v"))
          .select("u", "v").distinct()
        val e1 = e.toDF("a", "b")
        val e2 = e.toDF("b", "c")
        val e3 = e.toDF("a", "c")
        val tri = e1.join(e2, "b").join(e3, Seq("a", "c"))
        val perNode = tri.select(col("a").as("node"))
          .unionAll(tri.select(col("b").as("node")))
          .unionAll(tri.select(col("c").as("node")))
        perNode.groupBy("node").agg(count(lit(1)).as("n_triangles"))
          .orderBy(desc("n_triangles"), asc("node"))
          .limit(20)
      },
      Some("""
        WITH cs AS (SELECT DISTINCT o_custkey % 97 AS c, l_suppkey % 31 AS sp
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                    WHERE l_quantity >= 49 AND o_totalprice < 50000),
        e AS (SELECT DISTINCT a.c AS u, b.c AS v FROM cs a JOIN cs b
              ON a.sp = b.sp AND a.c < b.c),
        tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                FROM e e1 JOIN e e2 ON e1.v = e2.u
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        pern AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
                 UNION ALL SELECT c FROM tri)
        SELECT node, count(*) AS n_triangles FROM pern
        GROUP BY 1 ORDER BY n_triangles DESC, node LIMIT 20"""),
      "ordered-triple triangle enumeration on the co-purchase projection; per-node participation"),

    // ---------------------------------------------------------------
    // Equi-depth histogram: NTILE(10) deciles of value per event
    // type. The window's ORDER BY carries event_id as tiebreak — a
    // TOTAL order, without which ntile's bucket boundaries on tied
    // values are engine-dependent. Bucket stats are min/max/count —
    // rank statistics, no accumulation noise.
    // ---------------------------------------------------------------
    Q("q146_value_deciles",
      (s, dir) => {
        val w = Window.partitionBy("event_type").orderBy("value", "event_id")
        events(s, dir)
          .select(col("event_type"), col("value"), col("event_id"))
          .withColumn("decile", ntile(10).over(w))
          .groupBy("event_type", "decile")
          .agg(count(lit(1)).as("n"),
            // min/max of identical doubles are bit-identical rank
            // stats — rounding could only ADD a cross-engine boundary
            min("value").as("lo"), max("value").as("hi"))
          .orderBy("event_type", "decile")
      },
      Some("""
        WITH d AS (SELECT event_type, value,
                          ntile(10) OVER (PARTITION BY event_type
                                          ORDER BY value, event_id) AS decile
                   FROM events)
        SELECT event_type, decile, count(*) AS n,
               min(value) AS lo, max(value) AS hi
        FROM d GROUP BY 1, 2 ORDER BY 1, 2"""),
      "equi-depth deciles per type: total-ordered ntile, rank-statistic bucket bounds"),

    // ---------------------------------------------------------------
    // KMV / theta-sketch set algebra (graft.ops.ThetaSketch): distinct
    // (user, day) pairs with a click vs with a purchase — per-set,
    // union, and intersection cardinality estimates plus Jaccard, all
    // from two k=256 sketches. Sketch build is distributed (distinct +
    // TakeOrdered top-k); the set ops run on ≤ k-row frames. hash52 is
    // bit-identical in DuckDB, so the oracle replays the exact
    // estimator — at sf0.01+ the sketches saturate (estimation mode),
    // at sf0.001 they stay exhaustive (exact mode): both branches are
    // oracled across the driver's scale ladder.
    // ---------------------------------------------------------------
    Q("q149_theta_sketch",
      (s, dir) => {
        import graft.ops.ThetaSketch
        val k = 256
        def pairs(t: String) = events(s, dir)
          .filter(col("event_type") === t && col("ts").isNotNull)
          .select(concat(col("user_id"), lit(":"), to_date(col("ts"))).as("key"))
        val skA = ThetaSketch.kmv(pairs("click"), col("key"), k)
        val skB = ThetaSketch.kmv(pairs("purchase"), col("key"), k)
        ThetaSketch.setOps(s, skA, skB, k)
      },
      Some("""
        WITH ak AS (SELECT DISTINCT user_id::VARCHAR || ':' ||
                           (ts::DATE)::VARCHAR AS key
                    FROM events WHERE event_type = 'click' AND ts IS NOT NULL),
        bk AS (SELECT DISTINCT user_id::VARCHAR || ':' ||
                      (ts::DATE)::VARCHAR AS key
               FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL),
        ah AS (SELECT DISTINCT ('0x' || substr(md5(key), 1, 13))::BIGINT AS h
               FROM ak),
        bh AS (SELECT DISTINCT ('0x' || substr(md5(key), 1, 13))::BIGINT AS h
               FROM bk),
        ska AS (SELECT h FROM ah ORDER BY h LIMIT 256),
        skb AS (SELECT h FROM bh ORDER BY h LIMIT 256),
        na AS (SELECT count(*) AS n, max(h) AS mx FROM ska),
        nb AS (SELECT count(*) AS n, max(h) AS mx FROM skb),
        su AS (SELECT h FROM ska UNION SELECT h FROM skb),
        sku AS (SELECT h FROM su ORDER BY h LIMIT 256),
        nu AS (SELECT count(*) AS n, max(h) AS mx FROM sku),
        th AS (SELECT
            CASE WHEN na.n < 256 THEN 4503599627370496 ELSE na.mx END AS tha,
            CASE WHEN nb.n < 256 THEN 4503599627370496 ELSE nb.mx END AS thb,
            CASE WHEN nu.n < 256 THEN 4503599627370496 ELSE nu.mx END AS thu
          FROM na, nb, nu),
        t AS (SELECT least(tha, thb, thu) AS theta, tha, thb FROM th),
        cnt AS (SELECT
            (SELECT count(*) FROM ska, t WHERE h < t.tha) AS ca,
            (SELECT count(*) FROM skb, t WHERE h < t.thb) AS cb,
            (SELECT count(*) FROM su, t WHERE h < t.theta) AS cu,
            (SELECT count(*) FROM su, t WHERE h < t.theta
               AND h IN (SELECT h FROM ska)
               AND h IN (SELECT h FROM skb)) AS ci)
        SELECT
          round(cnt.ca * 4503599627370496.0 / t.tha)::BIGINT AS est_a,
          round(cnt.cb * 4503599627370496.0 / t.thb)::BIGINT AS est_b,
          round(cnt.cu * 4503599627370496.0 / t.theta)::BIGINT AS est_union,
          round(cnt.ci * 4503599627370496.0 / t.theta)::BIGINT AS est_inter,
          CASE WHEN cnt.cu = 0 THEN 0
               ELSE round(10000.0 * cnt.ci / cnt.cu)::BIGINT END AS jaccard_bp
        FROM cnt, t"""),
      "KMV/theta-sketch set algebra: per-set, union, intersection distinct estimates + Jaccard, exact hash-replay oracle"),

    // ---------------------------------------------------------------
    // Pairwise Pearson correlation matrix across event-type daily
    // series from EXACT INTEGER MOMENTS (n, Σx, Σy, Σxy, Σx², Σy² on
    // the cent grid — value is 2-decimal, so ×100 is exact): the
    // covariance/variance numerators n·Σxy − Σx·Σy stay integral, and
    // the only floating steps (one long→double cast, one sqrt, one
    // divide) are identical IEEE on both engines. library corr()
    // accumulation order would diverge at the ulp — same rationale as
    // the tick-grid tier above. One self-equi-join on day; series
    // pairs bounded by the type alphabet.
    // ---------------------------------------------------------------
    Q("q153_corr_matrix",
      (s, dir) => {
        val daily = events(s, dir).filter(col("ts").isNotNull)
          .select(to_date(col("ts")).as("day"), col("event_type"),
            col("value").cast("double").as("v"))
          .groupBy("day", "event_type")
          .agg(round(sum("v") * 100).cast("long").as("x"))
        val a = daily.toDF("day", "t1", "xa")
        val b = daily.toDF("day", "t2", "xb")
        val m = a.join(b, "day").filter(col("t1") < col("t2"))
          .groupBy("t1", "t2")
          .agg(count(lit(1)).as("n"),
            sum("xa").as("sx"), sum("xb").as("sy"),
            sum(col("xa") * col("xb")).as("sxy"),
            sum(col("xa") * col("xa")).as("sxx"),
            sum(col("xb") * col("xb")).as("syy"))
          .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
          .withColumn("denx", col("n") * col("sxx") - col("sx") * col("sx"))
          .withColumn("deny", col("n") * col("syy") - col("sy") * col("sy"))
        m.filter(col("denx") > 0 && col("deny") > 0)
          .select(col("t1"), col("t2"), col("n"),
            round(lit(10000.0) * col("num") /
              sqrt(col("denx").cast("double") * col("deny")))
              .cast("long").as("r_bp"))
          .orderBy("t1", "t2")
      },
      Some("""
        WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type,
                          round(sum(value) * 100)::BIGINT AS x
                   FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        p AS (SELECT a.event_type AS t1, b.event_type AS t2,
                     count(*) AS n,
                     sum(a.x)::BIGINT AS sx, sum(b.x)::BIGINT AS sy,
                     sum(a.x * b.x)::BIGINT AS sxy,
                     sum(a.x * a.x)::BIGINT AS sxx,
                     sum(b.x * b.x)::BIGINT AS syy
              FROM d a JOIN d b ON a.day = b.day
                               AND a.event_type < b.event_type
              GROUP BY 1, 2)
        SELECT t1, t2, n,
               round(10000.0 * (n * sxy - sx * sy) /
                     sqrt((n * sxx - sx * sx)::DOUBLE
                          * (n * syy - sy * sy)))::BIGINT AS r_bp
        FROM p
        WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        ORDER BY t1, t2"""),
      "pairwise Pearson matrix from exact integer moments on the cent grid: one day equi-join, engine-identical floats"),

    // ---------------------------------------------------------------
    // Multi-source BFS over the q136 trade graph: hop distance from
    // the low-custkey seed set, capped at 3. Frontier form (per hop:
    // edges ⋈ frontier, anti-join vs visited) — hop cost ∝ frontier,
    // never a re-walk. Oracle = 3 reachability CTEs + min(dist).
    // Pure integers.
    // ---------------------------------------------------------------
    Q("q154_bfs_distances",
      (s, dir) => {
        val e0 = Tables(s, dir, "orders")
          .join(Tables(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .filter(col("o_custkey") < 200 && col("l_suppkey") < 100)
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
          .distinct()
        val edges = e0.select(col("c").as("src"), (col("sp") + 100000L).as("dst"))
          .unionByName(e0.select((col("sp") + 100000L).as("src"), col("c").as("dst")))
          .persist()
        val seeds = e0.filter(col("c") < 10).select(col("c").as("node")).distinct()
        Graph.bfsDistances(edges, seeds, maxHops = 3)
          .orderBy("node")
      },
      Some("""
        WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
                    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                    WHERE o_custkey < 200 AND l_suppkey < 100),
        e AS (SELECT c AS src, sp + 100000 AS dst FROM e0
              UNION ALL SELECT sp + 100000, c FROM e0),
        seeds AS (SELECT DISTINCT c AS node FROM e0 WHERE c < 10),
        r1 AS (SELECT DISTINCT e.dst AS node FROM e JOIN seeds s ON e.src = s.node),
        r2 AS (SELECT DISTINCT e.dst AS node FROM e JOIN r1 ON e.src = r1.node),
        r3 AS (SELECT DISTINCT e.dst AS node FROM e JOIN r2 ON e.src = r2.node),
        d AS (SELECT node, 0 AS dist FROM seeds
              UNION ALL SELECT node, 1 FROM r1
              UNION ALL SELECT node, 2 FROM r2
              UNION ALL SELECT node, 3 FROM r3)
        SELECT node, min(dist) AS dist FROM d GROUP BY 1 ORDER BY 1"""),
      "multi-source BFS hop distances, frontier-form iteration == unrolled reachability CTEs"),

    // ---------------------------------------------------------------
    // Distribution drift between month halves, per event type: value
    // histograms (10 fixed 50-wide bins) compared by total-variation
    // distance and the two-sample chi-square — the PSI use case
    // without PSI's ln(p/q) libm dependence. Integer numerators and
    // per-bin quantization keep every sum order-insensitive (see
    // graft.ops.Drift).
    // ---------------------------------------------------------------
    Q("q155_histogram_drift",
      (s, dir) => {
        import graft.ops.Drift
        val ev = events(s, dir).filter(col("ts").isNotNull)
          .withColumn("bin", least(floor(col("value") / 50), lit(9)).cast("long"))
        Drift.histogramDrift(ev, "event_type", "bin",
            dayofmonth(col("ts")) <= 15)
          .orderBy("event_type")
      },
      Some("""
        WITH base AS (
          SELECT event_type,
                 least(floor(value / 50), 9)::BIGINT AS bin,
                 CASE WHEN date_part('day', ts) <= 15 THEN 1 ELSE 0 END AS ia
          FROM events WHERE ts IS NOT NULL),
        c AS (SELECT event_type, bin,
                     sum(ia)::BIGINT AS a, sum(1 - ia)::BIGINT AS b
              FROM base GROUP BY 1, 2),
        t AS (SELECT event_type, sum(a)::BIGINT AS na, sum(b)::BIGINT AS nb
              FROM c GROUP BY 1),
        terms AS (SELECT c.event_type, t.na, t.nb,
                         abs(a * nb - b * na) AS tvt,
                         abs(sum(a * nb - b * na) OVER (
                           PARTITION BY c.event_type ORDER BY bin
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                           AS kst,
                         round(1000000.0 * (na + nb)
                               * (a * nb - b * na) * (a * nb - b * na)
                               / (na * nb * (a + b)))::BIGINT AS chit
                  FROM c JOIN t USING (event_type))
        SELECT event_type, na, nb,
               round(10000.0 * sum(tvt) / (2.0 * na * nb))::BIGINT AS tv_bp,
               round(10000.0 * max(kst) / (1.0 * na * nb))::BIGINT AS ks_bp,
               sum(chit)::BIGINT AS chi2_micro
        FROM terms GROUP BY 1, 2, 3 ORDER BY 1"""),
      "two-sample histogram drift per type: TV distance + chi-square from exact integer numerators, log-free PSI replacement"),

    // ---------------------------------------------------------------
    // Holt double-exponential (level+trend) smoothing with a 3-step
    // forecast — the q132 EWMA discipline extended to a two-state
    // recursion: the smoother's impulse-response weight tables are
    // computed ONCE in Scala (TimeSeries.holtWeights) and the SAME
    // doubles are rendered both into the Spark plan (typedLit) and
    // into the oracle's literal lists, so the closed-form evaluation
    // is bit-identical across engines by construction.
    // ---------------------------------------------------------------
    Q("q156_holt_forecast",
      (s, dir) => {
        val daily = events(s, dir)
          .filter(col("user_id") < 10 && col("ts").isNotNull)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            col("value").cast("double").as("v"))
          .groupBy("user_id", "day")
          .agg(round(sum("v"), 4).as("day_sum"))
        TimeSeries.holt(daily, Seq("user_id"), "day", "day_sum",
            alpha = 0.4, beta = 0.3, horizon = 3, maxLen = 40)
          .select(col("user_id"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("day_sum"), col("level"), col("forecast"))
          .orderBy("user_id", "day")
      },
      Some(holtOracle(alpha = 0.4, beta = 0.3, maxLen = 40, horizon = 3)),
      "Holt level+trend smoothing and h-step forecast in closed form, weight tables shared verbatim with the oracle"),

    // ---------------------------------------------------------------
    // 2-D skyline per return flag: lineitems minimizing extendedprice
    // while maximizing quantity (no other item is both cheaper and
    // larger). Spark runs the sort-based window plan (two shuffles +
    // one window — never an all-pairs join); the oracle runs the
    // quadratic NOT-EXISTS dominance definition — a cross-ALGORITHM
    // check, not a mirrored plan. Rank-statistic outputs: no rounding.
    // ---------------------------------------------------------------
    Q("q157_skyline",
      (s, dir) => {
        import graft.ops.Skyline
        // the qty >= 45 stratum keeps the ORACLE's quadratic dominance
        // check feasible at every gate scale (the Spark plan itself is
        // the linear-scan form and doesn't need the bound)
        val li = Tables(s, dir, "lineitem")
          .filter(col("l_quantity") >= 45)
          .select(col("l_returnflag").as("flag"),
            col("l_extendedprice").as("price"), col("l_quantity").as("qty"))
        Skyline.skyline2D(li, Seq("flag"), "price", "qty")
          .groupBy("flag", "price", "qty").agg(count(lit(1)).as("n"))
          .orderBy("flag", "price", "qty")
      },
      Some("""
        WITH pts AS (SELECT l_returnflag AS flag,
                            l_extendedprice AS price, l_quantity AS qty
                     FROM lineitem WHERE l_quantity >= 45)
        SELECT flag, price, qty, count(*) AS n
        FROM pts p
        WHERE NOT EXISTS (
          SELECT 1 FROM pts q
          WHERE q.flag = p.flag AND q.price <= p.price AND q.qty >= p.qty
            AND (q.price < p.price OR q.qty > p.qty))
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),
      "Pareto frontier per flag: windowed linear-scan plan == quadratic NOT-EXISTS dominance oracle"),

    // ---------------------------------------------------------------
    // Sweep-line max concurrency: events as intervals
    // [ts, ts + value seconds); peak simultaneous intervals per type =
    // max running sum over (+1 at start, −1 at end) endpoint deltas,
    // ends sorting before starts at the same instant (half-open
    // semantics). One explode (2 rows per event) + one ordered window
    // per type — the classic O(n log n) sweep as a plan, vs the naive
    // per-instant recount. Integer micros end to end.
    // ---------------------------------------------------------------
    Q("q160_max_concurrency",
      (s, dir) => {
        val ev = events(s, dir).filter(col("ts").isNotNull)
          .select(col("event_type"),
            unix_micros(col("ts").cast("timestamp")).as("t0"),
            (unix_micros(col("ts").cast("timestamp")) +
              round(col("value") * 1000000).cast("long")).as("t1"))
        val ends = ev.select(col("event_type"), col("t1").as("t"),
          lit(-1L).as("d"))
        val starts = ev.select(col("event_type"), col("t0").as("t"),
          lit(1L).as("d"))
        val w = Window.partitionBy("event_type").orderBy(col("t"), col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        starts.unionByName(ends)
          .withColumn("c", sum("d").over(w))
          .groupBy("event_type")
          .agg(max("c").as("peak"),
            min(when(col("d") === 1, col("t"))).as("first_start_us"),
            max(when(col("d") === -1, col("t"))).as("last_end_us"))
          .orderBy("event_type")
      },
      Some("""
        WITH iv AS (SELECT event_type,
                           epoch_us(ts) AS t0,
                           epoch_us(ts) + round(value * 1000000)::BIGINT AS t1
                    FROM events WHERE ts IS NOT NULL),
        pts AS (SELECT event_type, t0 AS t, 1 AS d FROM iv
                UNION ALL SELECT event_type, t1, -1 FROM iv),
        sw AS (SELECT event_type, d, t,
                      sum(d) OVER (PARTITION BY event_type ORDER BY t, d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
               FROM pts)
        SELECT event_type, max(c)::BIGINT AS peak,
               min(CASE WHEN d = 1 THEN t END) AS first_start_us,
               max(CASE WHEN d = -1 THEN t END) AS last_end_us
        FROM sw GROUP BY 1 ORDER BY 1"""),
      "sweep-line peak concurrency per type: endpoint-delta running sum, ends-before-starts tie rule"),

    // ---------------------------------------------------------------
    // Categorical association lang × source: one joint groupBy (the
    // only shuffle — contingency cells, not rows), marginals and the
    // grand total as window sums OVER THE JOINT CELLS (5 × 20 here;
    // bounded by |lang|·|source| at any corpus size — never a second
    // data scan). Lift = observed/expected = the log-free PMI core
    // (PMI = ln lift); chi2_part = this cell's chi-square term via
    // the identity (n·n_xy − n_x·n_y)² / (n·n_x·n_y), computed in
    // double from the start (counts stay exact below 2^53, and a
    // BIGINT triple product would overflow ~10M docs) — identical
    // IEEE ops on both engines, pinned with round(·, 6) on both sides.
    // ---------------------------------------------------------------
    Q("q162_assoc_lift",
      (s, dir) => {
        val joint = Tables(s, dir, "documents")
          .filter(col("lang").isNotNull && col("source").isNotNull)
          .groupBy("lang", "source").agg(count(lit(1)).as("n_xy"))
        // Each COUNT is cast to double BEFORE any multiply: counts are
        // exact in double up to 2^53, while a BIGINT triple product
        // (n·n_x·n_y) overflows Long around ~10M documents. The double
        // products/differences are then identical exactly-rounded IEEE
        // ops on both engines, pinned by round(·, 6).
        def d(c: String) = col(c).cast("double")
        val dev = d("n") * d("n_xy") - d("n_x") * d("n_y")
        joint
          .withColumn("n_x", sum("n_xy").over(Window.partitionBy("lang")))
          .withColumn("n_y", sum("n_xy").over(Window.partitionBy("source")))
          .withColumn("n", sum("n_xy").over(Window.partitionBy()))
          .withColumn("lift", round(d("n_xy") * d("n")
            / (d("n_x") * d("n_y")), 6))
          .withColumn("chi2_part", round(dev * dev
            / (d("n") * d("n_x") * d("n_y")), 6))
          .orderBy("lang", "source")
      },
      Some("""
        WITH joint AS (SELECT lang, source, count(*)::BIGINT AS n_xy
                       FROM documents
                       WHERE lang IS NOT NULL AND source IS NOT NULL
                       GROUP BY 1, 2),
        m AS (SELECT lang, source, n_xy,
                     sum(n_xy) OVER (PARTITION BY lang)::BIGINT AS n_x,
                     sum(n_xy) OVER (PARTITION BY source)::BIGINT AS n_y,
                     sum(n_xy) OVER ()::BIGINT AS n
              FROM joint)
        SELECT lang, source, n_xy, n_x, n_y, n,
               round(n_xy::DOUBLE * n::DOUBLE / (n_x::DOUBLE * n_y::DOUBLE), 6) AS lift,
               round((n::DOUBLE * n_xy::DOUBLE - n_x::DOUBLE * n_y::DOUBLE)
                     * (n::DOUBLE * n_xy::DOUBLE - n_x::DOUBLE * n_y::DOUBLE)
                     / (n::DOUBLE * n_x::DOUBLE * n_y::DOUBLE), 6) AS chi2_part
        FROM m ORDER BY 1, 2"""),
      "lang x source contingency: lift (log-free PMI) + chi-square terms from exact integer counts, one cell-level shuffle"),

    // ---------------------------------------------------------------
    // Grouped mode (argmax by frequency) with a DETERMINISTIC
    // tie-break — count desc, then lexicographically smallest type —
    // because a mode without a pinned tie rule isn't oracle-able (or
    // reproducible run to run). One row-level shuffle builds the
    // (user, type) counts; the row_number window then runs over those
    // COUNTS (≤ users × types rows), not the data, and the per-user
    // total rides the same partitioning for free.
    // ---------------------------------------------------------------
    Q("q164_grouped_mode",
      (s, dir) => {
        val counts = events(s, dir)
          .filter(col("user_id").isNotNull && col("event_type").isNotNull)
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("cnt"))
        val byUser = Window.partitionBy("user_id")
        val rank = byUser.orderBy(col("cnt").desc, col("event_type"))
        counts
          .withColumn("rn", row_number().over(rank))
          .withColumn("total", sum("cnt").over(byUser))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("modal_type"),
            col("cnt").as("modal_cnt"), col("total"))
          .orderBy("user_id")
      },
      Some("""
        WITH c AS (SELECT user_id, event_type, count(*)::BIGINT AS cnt
                   FROM events
                   WHERE user_id IS NOT NULL AND event_type IS NOT NULL
                   GROUP BY 1, 2),
        r AS (SELECT user_id, event_type, cnt,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY cnt DESC, event_type) AS rn,
                     sum(cnt) OVER (PARTITION BY user_id)::BIGINT AS total
              FROM c)
        SELECT user_id, event_type AS modal_type, cnt AS modal_cnt, total
        FROM r WHERE rn = 1 ORDER BY user_id"""),
      "per-group mode with pinned tie-break (cnt desc, type asc); window runs over counts, not rows")
  )

  /** The q156 oracle: Holt weight tables rendered as DuckDB list
    * literals FROM THE SAME [[TimeSeries.holtWeights]] doubles the
    * Spark plan embeds via typedLit — the two sides cannot drift
    * (Double.toString round-trips, and DuckDB parses decimal literals
    * to the nearest double, i.e. the identical bits). */
  private def holtOracle(alpha: Double, beta: Double, maxLen: Int,
      horizon: Int): String = {
    val (ws, wb) = TimeSeries.holtWeights(alpha, beta, maxLen)
    def render(t: Seq[Seq[Double]]) =
      t.map(_.mkString("[", ", ", "]")).mkString("[", ", ", "]")
    s"""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 round(sum(value::DOUBLE), 4) AS day_sum
          FROM events WHERE user_id < 10 AND ts IS NOT NULL
          GROUP BY 1, 2),
        l AS (SELECT user_id, day, day_sum,
                     list(day_sum) OVER (PARTITION BY user_id ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
              FROM daily),
        w AS (SELECT ${render(ws)} AS ws, ${render(wb)} AS wb)
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day, day_sum,
               round(list_sum([p[i::INT] * ws[length(p)][i::INT]
                               for i in range(1, length(p) + 1)]), 4) AS level,
               round(list_sum([p[i::INT] * ws[length(p)][i::INT]
                               for i in range(1, length(p) + 1)])
                     + $horizon.0 *
                       list_sum([p[i::INT] * wb[length(p)][i::INT]
                                 for i in range(1, length(p) + 1)]), 4)
                 AS forecast
        FROM l, w ORDER BY user_id, day"""
  }

  /** The q143 oracle: `n` BPE training steps unrolled as generated
    * CTEs — pair counts over w_{i-1}, argmax with the same (count
    * desc, alias-space pair asc) tie-break, literal rewrite to
    * chr(0xE000+i−1) — then per-symbol counts with aliases rendered
    * back to surface text via reverse-order replaces. Mirrors
    * [[graft.ext.Bpe.learnMerges]] step for step. */
  private def bpeTrainOracle(n: Int): String = {
    val head = """WITH words AS (
          SELECT w, count(*) AS cnt FROM (
            SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
            FROM documents) t
          WHERE regexp_matches(w, '^[a-z]+$') AND length(w) >= 2
          GROUP BY 1),
        w0 AS (SELECT w, cnt FROM words)"""
    val steps = (1 to n).map { i =>
      s"""p$i AS (SELECT substr(w, i, 2) AS pair, sum(cnt)::BIGINT AS n
          FROM w${i - 1}, unnest(range(1, length(w))) AS u(i)
          WHERE length(w) >= 2 GROUP BY 1),
        m$i AS (SELECT pair FROM p$i ORDER BY n DESC, pair LIMIT 1),
        w$i AS (SELECT replace(w, (SELECT pair FROM m$i), chr(${0xE000 + i - 1})) AS w, cnt
          FROM w${i - 1})"""
    }
    val render = (n to 1 by -1).foldLeft("sym") { (acc, i) =>
      s"replace($acc, chr(${0xE000 + i - 1}), (SELECT pair FROM m$i))"
    }
    val tail = s"""toks AS (SELECT substr(w, i, 1) AS sym, sum(cnt)::BIGINT AS n
          FROM w$n, unnest(range(1, length(w) + 1)) AS u(i) GROUP BY 1)
        SELECT $render AS token, n
        FROM toks ORDER BY n DESC, token LIMIT 30"""
    (Seq(head) ++ steps ++ Seq(tail)).mkString(",\n        ")
  }
}
