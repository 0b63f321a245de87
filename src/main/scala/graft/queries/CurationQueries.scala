package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.QualityChecks
import graft.ext.{Curation, Dedup, DetHash, Multimodal, Similarity, TextAnalysis}

/** Curation extension queries (SURVEY.md §7.5): decontamination,
  * PII redaction, stratified / weighted / temperature sampling,
  * sequence packing, repetition scoring, doc chunking, source token
  * caps, the curation funnel, and deterministic seeded shuffling. */
object CurationQueries {

  /** Frozen mixture weights for q60 (per `source` stratum); the oracle
    * CASE is generated from the SAME map so the two sides cannot drift. */
  private val sampleFracs: Map[String, Double] =
    Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.75)

  private def sqlFracCase: String =
    "CASE " + sampleFracs.map { case (k, v) =>
      s"WHEN source = '$k' THEN ${(v * 1000000L).toLong}"
    }.mkString(" ") + " ELSE 0 END"

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------
    // Curation: benchmark decontamination — docs sharing any 3-gram
    // with the held-out "benchmark" slice (doc_id % 50 == 0).
    // ---------------------------------------------------------------
    Q("q58_decontaminate",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        Curation.decontaminate(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 3)
          .orderBy("doc_id")
      },
      Some(s"""
        WITH ${DedupQueries.shingleCte},
        bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0)
        SELECT s.doc_id, count(*) AS n_contaminated_grams
        FROM sh s JOIN bsh USING (shingle)
        WHERE s.doc_id % 50 <> 0
        GROUP BY 1 ORDER BY 1"""),
      "train/test decontamination: corpus-vs-benchmark 3-gram equi-join"),

    // ---------------------------------------------------------------
    // Curation: PII redaction — deterministic PII is planted on every
    // 10th doc, then scrubbed; the md5 of the redacted text pins the
    // replacement spans byte-for-byte, and the untouched docs prove no
    // false positives.
    // ---------------------------------------------------------------
    Q("q59_pii_redact",
      (s, dir) => {
        val planted = Tables(s, dir, "documents").withColumn("t2",
          when(col("doc_id") % 10 === 0, concat(col("text"),
            lit(" reach me at u"), col("doc_id").cast("string"),
            lit("@test.org or 555-123-4567 from 10.0.0.1")))
            .otherwise(col("text")))
        planted.select(
          col("doc_id"),
          Curation.piiCount(col("t2")).cast("long").as("n_pii"),
          md5(Curation.redactPii(col("t2")).cast("binary")).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 10 = 0
                      THEN text || ' reach me at u' || doc_id::VARCHAR ||
                           '@test.org or 555-123-4567 from 10.0.0.1'
                      ELSE text END AS t2
          FROM documents)
        SELECT doc_id,
               (len(regexp_extract_all(t2, '${Curation.emailRe}')) +
                len(regexp_extract_all(t2, '${Curation.phoneRe}')) +
                len(regexp_extract_all(t2, '${Curation.ipRe}')))::BIGINT AS n_pii,
               md5(regexp_replace(regexp_replace(regexp_replace(t2,
                     '${Curation.emailRe}', '<EMAIL>', 'g'),
                     '${Curation.phoneRe}', '<PHONE>', 'g'),
                     '${Curation.ipRe}', '<IP>', 'g')) AS clean_md5
        FROM planted ORDER BY doc_id"""),
      "PII scrub: email/phone/IPv4 -> typed placeholders, RE2-safe shared regexes"),

    // ---------------------------------------------------------------
    // Curation: deterministic stratified sampling by source — the
    // training-mixture knob; hash-keyed selection is exactly
    // reproducible (same rows in DuckDB), unlike rand() sampling.
    // ---------------------------------------------------------------
    Q("q60_stratified_sample",
      (s, dir) => Curation.stratifiedSample(
          Tables(s, dir, "documents"), "doc_id", "source", sampleFracs)
        .select("doc_id", "source")
        .orderBy("doc_id"),
      Some(s"""
        SELECT doc_id, source FROM documents
        WHERE ${DetHash.sqlHash52("doc_id::VARCHAR")} % 1000000 < $sqlFracCase
        ORDER BY doc_id"""),
      "deterministic per-stratum Bernoulli sample on hash52(doc_id)"),

    // ---------------------------------------------------------------
    // Curation: sequence packing — concat-and-chunk into ~512-token
    // packs within 8 deterministic hash buckets (the parallel unit).
    // ---------------------------------------------------------------
    Q("q61_pack_sequences",
      (s, dir) => Curation.packSequences(
          Tables(s, dir, "documents")
            .select(col("doc_id"),
              size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", maxTokens = 512L, nBuckets = 8)
        .select("doc_id", "n_tokens", "bucket", "pack_no")
        .orderBy("doc_id"),
      Some(s"""
        WITH t AS (SELECT doc_id,
                          len(string_split_regex(lower(text), '\\s+'))::BIGINT AS n_tokens,
                          ${DetHash.sqlHash52("doc_id::VARCHAR")} AS h
                   FROM documents),
        c AS (SELECT doc_id, n_tokens, h % 8 AS bucket,
                     sum(n_tokens) OVER (PARTITION BY h % 8 ORDER BY h, doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
        SELECT doc_id, n_tokens, bucket, ((cum - n_tokens) // 512)::BIGINT AS pack_no
        FROM c ORDER BY doc_id"""),
      "hash-bucketed concat-and-chunk packing: one shuffle, per-bucket windows"),

    // ---------------------------------------------------------------
    // Curation: Gopher-style repetition score — fraction of bigram
    // occurrences that repeat; catches boilerplate dedup misses.
    // ---------------------------------------------------------------
    Q("q62_repetition",
      (s, dir) => Curation.repetitionScore(
          Tables(s, dir, "documents"), "doc_id", "text", n = 2)
        .orderBy("doc_id"),
      Some("""
        WITH tok AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
                     FROM documents),
        g AS (SELECT doc_id, unnest([array_to_string(t[i:i+1], ' ')
                                     for i in range(1, len(t))]) AS gram
              FROM tok WHERE len(t) >= 2)
        SELECT doc_id, count(*) AS n_grams,
               count(DISTINCT gram) AS n_distinct,
               round(1.0 - count(DISTINCT gram)::DOUBLE / count(*), 4) AS repetition
        FROM g GROUP BY 1 ORDER BY 1"""),
      "repeated-bigram fraction per doc: explode + one aggregation"),

    // ---------------------------------------------------------------
    // Curation: overlapping token-window chunking (32-token chunks,
    // 8-token overlap) — the unit embedding pipelines consume.
    // ---------------------------------------------------------------
    Q("q64_chunk_docs",
      (s, dir) => Curation.chunkDocs(
          Tables(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 32, overlap = 8)
        .orderBy("doc_id", "chunk_no"),
      Some("""
        WITH tk AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
                    FROM documents),
        n AS (SELECT doc_id, t,
                     (1 + ceil(greatest(len(t) - 32, 0)::DOUBLE / 24))::BIGINT AS nc
              FROM tk),
        c AS (SELECT doc_id, t, unnest(range(0, nc)) AS chunk_no FROM n)
        SELECT doc_id, chunk_no::BIGINT AS chunk_no,
               array_to_string(t[(chunk_no * 24 + 1)::INT:(chunk_no * 24 + 32)::INT], ' ')
                 AS chunk_text,
               least(len(t) - chunk_no * 24, 32)::BIGINT AS chunk_tokens
        FROM c ORDER BY doc_id, chunk_no"""),
      "map-side overlapping token windows: slice + array_join, no shuffle"),

    // ---------------------------------------------------------------
    // Curation: absolute per-source token budget (the mixture-control
    // twin of q60's relative fractions).
    // ---------------------------------------------------------------
    Q("q65_source_token_cap",
      (s, dir) => Curation.capSourceTokens(
          Tables(s, dir, "documents")
            .select(col("doc_id"), col("source"),
              size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens")),
          "doc_id", "n_tokens", "source", budget = 1000L)
        .orderBy("doc_id"),
      Some(s"""
        WITH t AS (SELECT doc_id, source,
                          len(string_split_regex(lower(text), '\\s+'))::BIGINT AS n_tokens,
                          ${DetHash.sqlHash52("doc_id::VARCHAR")} AS h
                   FROM documents),
        c AS (SELECT doc_id, source, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
        SELECT doc_id, source, n_tokens FROM c
        WHERE cum - n_tokens < 1000 ORDER BY doc_id"""),
      "deterministic-order running total per source, cut at the budget line"),

    // ---------------------------------------------------------------
    // Curation funnel: the WHOLE pipeline composed — benchmark slice →
    // LSH near-dup drop → decontamination → quality gates → per-source
    // funnel report. Every stage reuses an operator with its own green
    // oracle (q32, q58, q39); this pins their composition.
    // ---------------------------------------------------------------
    Q("q69_curation_funnel",
      (s, dir) => Curation.curationFunnel(
          Tables(s, dir, "documents"), "doc_id", "text", "source")
        .orderBy("source"),
      Some {
        val en = TextAnalysis.langMarkers.head._2.map(m => s"'$m'").mkString(", ")
        s"""
        WITH tok AS (SELECT doc_id, source, text,
                            string_split_regex(lower(text), '\\s+') AS t
                     FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      unnest([array_to_string(t[i:i+2], ' ')
                              for i in range(1, len(t)-1)]) AS shingle
               FROM tok WHERE len(t) >= 3),
        csh AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0),
        bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
        h AS (SELECT doc_id, ${DetHash.sqlHash52("shingle")} AS hv FROM csh),
        sig AS (SELECT doc_id, ${DedupQueries.sqlSig} FROM h GROUP BY doc_id),
        bands AS (${DedupQueries.sqlBands}),
        dup AS (SELECT DISTINCT b.doc_id
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bucket = b.bucket
                 AND a.doc_id < b.doc_id),
        contam AS (SELECT c.doc_id FROM csh c JOIN bsh USING (shingle)
                   GROUP BY 1 HAVING count(*) >= 3),
        q AS (SELECT doc_id, source, len(t)::BIGINT AS n_tokens,
                     round(0.5 * (len([x for x in t if x IN ($en)])::DOUBLE / len(t))
                         + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))::DOUBLE / length(text))
                         + 0.2 * least(len(t)::DOUBLE / 100.0, 1.0), 4) AS quality_score
              FROM tok),
        v AS (SELECT q.source, q.n_tokens, q.quality_score,
                     CASE WHEN q.doc_id % 97 = 0 THEN 'benchmark'
                          WHEN d.doc_id IS NOT NULL THEN 'near_dup'
                          WHEN c.doc_id IS NOT NULL THEN 'contaminated'
                          WHEN q.n_tokens < 20 OR q.quality_score < 0.38
                            THEN 'low_quality'
                          ELSE 'kept' END AS verdict
              FROM q LEFT JOIN dup d ON d.doc_id = q.doc_id
                     LEFT JOIN contam c ON c.doc_id = q.doc_id)
        SELECT source, count(*) AS n_docs,
               count(*) FILTER (WHERE verdict = 'benchmark') AS n_bench,
               count(*) FILTER (WHERE verdict = 'near_dup') AS n_dup,
               count(*) FILTER (WHERE verdict = 'contaminated') AS n_contam,
               count(*) FILTER (WHERE verdict = 'low_quality') AS n_lowq,
               count(*) FILTER (WHERE verdict = 'kept') AS n_kept,
               coalesce(sum(n_tokens) FILTER (WHERE verdict = 'kept'), 0)::BIGINT
                 AS tokens_kept,
               round(coalesce(avg(quality_score) FILTER (WHERE verdict = 'kept'), 0), 4)
                 AS avg_quality_kept
        FROM v GROUP BY 1 ORDER BY 1"""
      },
      "composed funnel: verdict precedence over LSH dedup + decontam + quality"),

    // ---------------------------------------------------------------
    // Weighted sampling without replacement (Efraimidis–Spirakis),
    // k per source stratum, weight = document length: inclusion odds
    // scale with weight, selection is hash-deterministic (the oracle
    // draws the SAME uniforms), one window shuffle on the stratum.
    // ---------------------------------------------------------------
    Q("q80_weighted_sample",
      (s, dir) => Curation.weightedSample(Tables(s, dir, "documents"),
          "doc_id", "source", "n_chars", k = 10)
        .select("source", "doc_id", "n_chars")
        .orderBy("source", "doc_id"),
      Some(s"""
        WITH w AS (
          SELECT source, doc_id, n_chars,
                 ln((${DetHash.sqlHash52("doc_id::VARCHAR")} + 1)::DOUBLE
                    / 4503599627370496.0) / n_chars::DOUBLE AS es_key
          FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
        SELECT source, doc_id, n_chars FROM (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY es_key DESC, doc_id) AS r
          FROM w)
        WHERE r <= 10 ORDER BY source, doc_id"""),
      "ES keys ln(u)/w from deterministic uniforms; top-k per stratum"),

    // ---------------------------------------------------------------
    // Deterministic seeded shuffle: the training-batch order. Purely
    // map-side (no rand(), no global row_number), so retries and other
    // engines reproduce the epoch order bit-for-bit — which is exactly
    // what the oracle checks.
    // ---------------------------------------------------------------
    Q("q91_deterministic_shuffle",
      (s, dir) => Curation.deterministicShuffle(
          Tables(s, dir, "documents"), "doc_id", "ep0", 8)
        .select("doc_id", "batch", "shuffle_key")
        .orderBy("batch", "shuffle_key", "doc_id"),
      Some(s"""
        WITH h AS (SELECT doc_id,
                          ${DetHash.sqlHash52("'ep0:' || doc_id")} AS shuffle_key
                   FROM documents)
        SELECT doc_id, (shuffle_key % 8)::INT AS batch, shuffle_key
        FROM h ORDER BY batch, shuffle_key, doc_id"""),
      "seeded hash shuffle: reproducible epoch order + batch split, no rand()"),

    // ---------------------------------------------------------------
    // Temperature-weighted source mixing: weights table AND realized
    // sample sizes in one report. The sample filter is the same
    // integer micro-fraction threshold as q60, so the realized counts
    // are deterministic, not approximately-binomial.
    // ---------------------------------------------------------------
    Q("q92_temperature_mix",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val w = Curation.mixingWeights(docs, "source", 0.5, 300L)
        // reuse w's (eager, one-row-per-source) counts for the sample
        // threshold — calling temperatureSample here would re-run the
        // same corpus aggregation a second time
        val sampled = Curation
          .temperatureSampleWithWeights(docs, "doc_id", "source", w)
          .groupBy("source").agg(count(lit(1)).as("n_sampled"))
        w.join(sampled, Seq("source"), "left")
          .select(col("source"), col("n"),
            round(col("p"), 4).as("p"),
            round(col("frac"), 4).as("frac"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
          .orderBy("source")
      },
      Some(s"""
        WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        t AS (SELECT sum(pow(n, 0.5)) AS tot FROM c),
        w AS (SELECT source, n,
                     pow(n, 0.5) / tot AS p,
                     least(1.0, 300.0 * (pow(n, 0.5) / tot) / n) AS frac
              FROM c CROSS JOIN t),
        s AS (SELECT d.source, count(*) AS n_sampled
              FROM documents d JOIN w USING (source)
              WHERE ${DetHash.sqlHash52("d.doc_id::VARCHAR")} % 1000000
                    < floor(w.frac * 1000000)::BIGINT
              GROUP BY 1)
        SELECT w.source, w.n, round(w.p, 4) AS p, round(w.frac, 4) AS frac,
               coalesce(s.n_sampled, 0)::BIGINT AS n_sampled
        FROM w LEFT JOIN s USING (source) ORDER BY source"""),
      "alpha=0.5 temperature mixing: n^alpha weights -> deterministic keep thresholds"),

    // ---------------------------------------------------------------
    // Declarative data-quality constraint report (the Deequ idea):
    // six checks over `documents`, evaluated in ONE aggregate pass —
    // a 12-check suite at 100 TB is still exactly one scan. The
    // oracle recomputes every metric and verdict independently.
    // ---------------------------------------------------------------
    Q("q131_quality_checks",
      (s, dir) => QualityChecks.report(Tables(s, dir, "documents"), Seq(
        QualityChecks.notNull("text"),
        QualityChecks.unique("doc_id"),
        QualityChecks.inRange("n_chars", 1, 100000),
        QualityChecks.inSet("lang", Seq("en", "de", "fr", "es", "zh")),
        QualityChecks.satisfies("text_min_len", length(col("text")) >= 10, 0.99),
        QualityChecks.sizeAtLeast(100))),
      Some("""
        WITH m AS (SELECT
          round(count(text)::DOUBLE / count(*), 6) AS m0,
          round(count(DISTINCT doc_id)::DOUBLE / count(doc_id), 6) AS m1,
          round(sum(CASE WHEN n_chars BETWEEN 1 AND 100000 THEN 1 ELSE 0 END)::DOUBLE
                / greatest(count(n_chars), 1), 6) AS m2,
          round(sum(CASE WHEN lang IN ('en','de','fr','es','zh') THEN 1 ELSE 0 END)::DOUBLE
                / greatest(count(lang), 1), 6) AS m3,
          round(sum(CASE WHEN length(text) >= 10 THEN 1 ELSE 0 END)::DOUBLE
                / count(*), 6) AS m4,
          round(count(*)::DOUBLE, 6) AS m5
          FROM documents)
        SELECT 0 AS ord, 'not_null(text)' AS "check", m0 AS metric, m0 >= 1.0 AS passed FROM m
        UNION ALL
        SELECT 1, 'unique(doc_id)', m1, m1 = 1.0 FROM m
        UNION ALL
        SELECT 2, 'in_range(n_chars)', m2, m2 >= 1.0 FROM m
        UNION ALL
        SELECT 3, 'in_set(lang)', m3, m3 >= 1.0 FROM m
        UNION ALL
        SELECT 4, 'satisfies(text_min_len)', m4, m4 >= 0.99 FROM m
        UNION ALL
        SELECT 5, 'size_at_least', m5, m5 >= 100.0 FROM m
        ORDER BY ord"""),
      "Deequ-style single-pass constraint suite: six checks, one scan, per-check metric + verdict"),

    // ---------------------------------------------------------------
    // Deterministic weighted sampling via PRIORITY SAMPLING (Duffield–
    // Lund–Thorup 2007): per event_type, the 20 highest w/u priorities
    // (u from hash52 — bit-identical in DuckDB) plus the unbiased
    // estimation weight max(w, τ). One multiply + one divide per row —
    // no pow/log, so the whole sample AND its estimator weights are
    // oracle-exact. Priorities are map-side; the rank is one window
    // over the group shuffle.
    // ---------------------------------------------------------------
    Q("q151_priority_sample",
      (s, dir) => {
        import graft.ops.PrioritySample
        val ev = Tables(s, dir, "events")
          .select(col("event_type"), col("event_id"), col("value").as("w"))
          .filter(col("w") > 0)
        PrioritySample.sampleByGroup(ev, "event_id", "w", 20, Seq("event_type"))
          .select(col("event_type"), col("rn"), col("event_id"), col("w"),
            col("w_est"))
          .orderBy("event_type", "rn")
      },
      Some(s"""
        WITH p AS (
          SELECT event_type, event_id, value AS w,
                 value * 4503599627370496.0 /
                   (${DetHash.sqlHash52("event_id::VARCHAR")} + 1) AS pr
          FROM events WHERE value > 0),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY event_type ORDER BY pr DESC, event_id) AS rn
              FROM p),
        tau AS (SELECT event_type, pr AS tau FROM r WHERE rn = 21)
        SELECT r.event_type, r.rn, r.event_id, r.w,
               CASE WHEN tau.tau IS NULL THEN r.w
                    ELSE greatest(r.w, tau.tau) END AS w_est
        FROM r LEFT JOIN tau USING (event_type)
        WHERE rn <= 20
        ORDER BY event_type, rn"""),
      "priority sampling per group: top-20 w/u priorities + unbiased max(w,tau) estimation weights, hash-replay exact"),

    // ---------------------------------------------------------------
    // Privacy audit before a data release: k-anonymity and
    // l-diversity over the quasi-identifier (event_type, user bucket,
    // day) with the value band as the sensitive attribute. One
    // grouped aggregate builds the QI equivalence classes (shuffle on
    // the QI key, map-side combined), one more folds them to a per-
    // type report: k = the smallest class, how many classes and rows
    // sit under k=5, and the minimum sensitive-value diversity. Pure
    // integers end to end.
    // ---------------------------------------------------------------
    Q("q158_k_anonymity",
      (s, dir) => {
        val classes = Tables(s, dir, "events")
          .filter(col("ts").isNotNull)
          .select(col("event_type"), (col("user_id") % 100).as("bucket"),
            to_date(col("ts")).as("day"),
            floor(col("value") / 50).cast("long").as("band"))
          .groupBy("event_type", "bucket", "day")
          .agg(count(lit(1)).as("sz"), count_distinct(col("band")).as("ldiv"))
        classes.groupBy("event_type")
          .agg(
            count(lit(1)).as("n_classes"),
            min("sz").as("k_anonymity"),
            sum(when(col("sz") < 5, 1L).otherwise(0L)).as("classes_lt5"),
            sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("rows_at_risk"),
            min("ldiv").as("l_diversity"))
          .orderBy("event_type")
      },
      Some("""
        WITH c AS (
          SELECT event_type, user_id % 100 AS bucket, CAST(ts AS DATE) AS day,
                 count(*) AS sz,
                 count(DISTINCT floor(value / 50)::BIGINT) AS ldiv
          FROM events WHERE ts IS NOT NULL
          GROUP BY 1, 2, 3)
        SELECT event_type,
               count(*) AS n_classes,
               min(sz) AS k_anonymity,
               sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END)::BIGINT AS classes_lt5,
               sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)::BIGINT AS rows_at_risk,
               min(ldiv) AS l_diversity
        FROM c GROUP BY 1 ORDER BY 1"""),
      "k-anonymity + l-diversity release audit over QI equivalence classes, exact integers"),

    // ---------------------------------------------------------------
    // Leakage-safe train/val/test split: the split key is the CONTENT
    // fingerprint (md5 of the text), not the row id, so exact
    // duplicates can never straddle splits and leak eval data into
    // training — the det_hash52 8/1/1 assignment is reproducible
    // across runs and engines. The output ORACLES the guarantee
    // itself: per (source, split) doc counts plus `leaky_fps`, the
    // number of fingerprints assigned to more than one split, which
    // must be 0 by construction (a row-id split on this corpus would
    // not be — the dedup tier exists because duplicates do).
    // ---------------------------------------------------------------
    Q("q159_leakage_safe_split",
      (s, dir) => {
        val assigned = Tables(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            md5(col("text").cast("binary")).as("fp"))
          .withColumn("h", DetHash.hash52(col("fp")) % 10)
          .withColumn("split",
            when(col("h") < 8, "train").when(col("h") === 8, "val")
              .otherwise("test"))
        val leaky = assigned.groupBy("fp")
          .agg(count_distinct(col("split")).as("nsp"))
          .filter(col("nsp") > 1).count()
        assigned.groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"),
            count_distinct(col("fp")).as("n_distinct"))
          .withColumn("leaky_fps", lit(leaky))
          .orderBy("source", "split")
      },
      Some(s"""
        WITH a AS (
          SELECT doc_id, source, md5(text) AS fp,
                 ${DetHash.sqlHash52("md5(text)")} % 10 AS h
          FROM documents),
        sp AS (SELECT *, CASE WHEN h < 8 THEN 'train'
                              WHEN h = 8 THEN 'val'
                              ELSE 'test' END AS split
               FROM a),
        leak AS (SELECT count(*) AS leaky FROM (
          SELECT fp FROM sp GROUP BY fp
          HAVING count(DISTINCT split) > 1) t)
        SELECT source, split, count(*) AS n_docs,
               count(DISTINCT fp) AS n_distinct,
               (SELECT leaky FROM leak) AS leaky_fps
        FROM sp GROUP BY 1, 2 ORDER BY 1, 2"""),
      "content-fingerprint train/val/test split: duplicates co-assigned by construction, zero-leak guarantee oracled")
  )
}
