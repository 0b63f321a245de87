package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Curation, Dedup, DetHash, Multimodal, Similarity, TextAnalysis}

/** Text-analysis extension queries (SURVEY.md §7.5): lang-ID,
  * quality scoring (heuristic + frozen linear classifier), token
  * counts, fingerprinting, tf-idf, winnowing, count-min heavy
  * hitters, BM25 / boolean retrieval, grouped top-k and bigram LM
  * scoring. Oracle SQL is generated from the same frozen constants
  * as the Spark plans. */
object TextQueries {

  /** Frozen count-min parameters for q74 — shared by the Spark plan and
    * the generated oracle so the two sides cannot drift. */
  private val cmsWidth = 4096
  private val cmsDepth = 3
  private val cmsMin = 500L

  /** Frozen query-term sets for the retrieval queries (drawn from the
    * synthetic corpus vocabulary). */
  private val bm25Terms = Seq("hash", "join", "vector")
  private val boolTerms = Seq("hash", "join", "vector", "window")

  /** Shared winnowing oracle CTEs (k=8, w=4): normalized text → gram
    * positions → polynomial hash from [[TextAnalysis.winnowPowers]] →
    * ordered hash list per doc → distinct window minima `f(doc_id, fp)`.
    * Spark's `sequence(0, len-k)` is inclusive; range() here is
    * exclusive — bounds differ by one on purpose. */
  private val winnowCte = {
    val p = DetHash.P
    val pows = TextAnalysis.sqlWinnowPowers(8)
    s"""
    t AS (SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS nm
          FROM documents),
    g AS (SELECT doc_id, nm, unnest(range(0, greatest(length(nm) - 7, 0))) AS i
          FROM t),
    h AS (SELECT doc_id, i,
                 (list_sum([(ascii(substr(nm, (i + j + 1)::INT, 1))
                             * ($pows)[(j + 1)::INT]) % $p
                            for j in range(0, 8)]) % $p)::BIGINT AS hv
          FROM g),
    hl AS (SELECT doc_id, list(hv ORDER BY i) AS hs FROM h GROUP BY doc_id),
    f AS (SELECT doc_id,
                 unnest(list_distinct([list_min(hs[(jj + 1)::INT:(jj + 4)::INT])
                                       for jj in range(0, greatest(len(hs) - 3, 1))])) AS fp
          FROM hl)"""
  }

  /** DuckDB rendering of [[TextAnalysis.classifyQuality]]'s frozen
    * linear logit over a row with (text, toks) in scope — the SAME
    * term order as the Spark foldLeft so float accumulation matches.
    * Shared by q93 (the classifier itself) and q102 (the capstone
    * pipeline's quality gate): one rendering, no drift. */
  private[queries] val sqlQualityLogit = {
    val en = TextAnalysis.langMarkers.head._2.map(m => s"'$m'").mkString(", ")
    s"""-1.05
              + 3.2 * (len([x for x in toks if x IN ($en)])::DOUBLE / len(toks))
              + (-2.1) * ((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))::DOUBLE / length(text))
              + (-1.4) * ((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / length(text))
              + 0.6 * (list_sum([length(x) for x in toks])::DOUBLE / len(toks) / 10.0)
              + 1.1 * least(len(toks)::DOUBLE / 100.0, 1.0)"""
  }

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------
    // Text analysis: language ID confusion matrix
    // ---------------------------------------------------------------
    Q("q38_lang_id",
      (s, dir) => {
        val scored = TextAnalysis.withLangScores(Tables(s, dir, "documents"), "text")
        scored
          .withColumn("predicted", TextAnalysis.predictedLang)
          .groupBy("predicted", "lang")
          .agg(count(lit(1)).as("n"))
          .withColumnRenamed("lang", "actual")
          .orderBy("predicted", "actual")
      },
      Some {
        val markers = TextAnalysis.langMarkers.map { case (l, ms) =>
          l -> ms.map(m => s"'$m'").mkString(", ")
        }
        val scoreSel = markers.map { case (l, list) =>
          s"len([x for x in toks if x IN ($list)]) AS score_$l"
        }.mkString(", ")
        val allScores = markers.map { case (l, _) => s"score_$l" }.mkString(", ")
        val caseExpr = markers.map { case (l, _) =>
          s"WHEN score_$l = greatest($allScores) THEN '$l'"
        }.mkString(" ")
        s"""
        WITH t AS (SELECT lang, string_split_regex(lower(text), '\\s+') AS toks
                   FROM documents),
        s AS (SELECT lang, $scoreSel FROM t)
        SELECT CASE $caseExpr END AS predicted, lang AS actual, count(*) AS n
        FROM s GROUP BY 1, 2 ORDER BY 1, 2"""
      },
      "stopword-marker language ID; oracle generated from the same marker lists"),

    // ---------------------------------------------------------------
    // Text analysis: quality scoring
    // ---------------------------------------------------------------
    Q("q39_quality",
      (s, dir) => TextAnalysis.qualityMetrics(Tables(s, dir, "documents"), "text")
        .select("doc_id", "n_tokens", "mean_token_len", "punct_ratio",
          "digit_ratio", "stopword_ratio", "quality_score")
        .orderBy("doc_id"),
      Some {
        val en = TextAnalysis.langMarkers.head._2.map(m => s"'$m'").mkString(", ")
        s"""
        WITH t AS (SELECT doc_id, text, string_split_regex(lower(text), '\\s+') AS toks
                   FROM documents)
        SELECT doc_id,
               len(toks)::BIGINT AS n_tokens,
               round(list_sum([length(x) for x in toks])::DOUBLE / len(toks), 4) AS mean_token_len,
               round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))::DOUBLE
                     / length(text), 4) AS punct_ratio,
               round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                     / length(text), 4) AS digit_ratio,
               round(len([x for x in toks if x IN ($en)])::DOUBLE / len(toks), 4) AS stopword_ratio,
               round(0.5 * (len([x for x in toks if x IN ($en)])::DOUBLE / len(toks))
                   + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))::DOUBLE / length(text))
                   + 0.2 * least(len(toks)::DOUBLE / 100.0, 1.0), 4) AS quality_score
        FROM t ORDER BY doc_id"""
      }),

    // ---------------------------------------------------------------
    // Text analysis: token counting (whitespace + BPE-ish regex)
    // ---------------------------------------------------------------
    Q("q40_token_count",
      (s, dir) => TextAnalysis.tokenCounts(Tables(s, dir, "documents"), "text")
        .select("doc_id", "ws_tokens", "bpe_tokens")
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               len(string_split_regex(lower(text), '\s+'))::BIGINT AS ws_tokens,
               len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT AS bpe_tokens
        FROM documents ORDER BY doc_id""")),

    // ---------------------------------------------------------------
    // Text analysis: document fingerprint
    // ---------------------------------------------------------------
    Q("q41_fingerprint",
      (s, dir) => TextAnalysis.fingerprint(Tables(s, dir, "documents"), "text")
        .select("doc_id", "fp", "fp_int")
        .orderBy("doc_id"),
      Some("""
        WITH t AS (SELECT doc_id,
                          trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
                   FROM documents)
        SELECT doc_id, md5(norm) AS fp,
               ('0x' || substr(md5(norm), 1, 13))::BIGINT AS fp_int
        FROM t ORDER BY doc_id""")),

    // ---------------------------------------------------------------
    // Text analysis: tf-idf top terms
    // ---------------------------------------------------------------
    Q("q42_tfidf",
      (s, dir) => TextAnalysis.tfIdf(Tables(s, dir, "documents"), "doc_id", "text", topK = 3)
        .filter(col("doc_id") < 50)
        .orderBy("doc_id", "rank"),
      Some("""
        WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS token
                     FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, token, tfidf, rank FROM (
          SELECT t.doc_id, t.token,
                 round(t.tf * ln(n.n_docs::DOUBLE / d.df), 4) AS tfidf,
                 row_number() OVER (PARTITION BY t.doc_id
                   ORDER BY round(t.tf * ln(n.n_docs::DOUBLE / d.df), 4) DESC, t.token) AS rank
          FROM tf t JOIN dfq d USING (token) CROSS JOIN n
          WHERE t.doc_id < 50)
        WHERE rank <= 3 ORDER BY doc_id, rank""")),

    // ---------------------------------------------------------------
    // Text analysis: winnowing fingerprints (rolling hash) — k=8 char
    // grams, polynomial hash from the frozen power table, w=4 window
    // minima. Map-side arrays until the final explode; the oracle's
    // gram hash is generated from the SAME powers so the two sides
    // cannot drift.
    // ---------------------------------------------------------------
    Q("q49_winnow",
      (s, dir) => TextAnalysis.winnowFingerprints(
          Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id", "fp"),
      Some(s"""
        WITH $winnowCte
        SELECT doc_id, fp FROM f ORDER BY doc_id, fp"""),
      "winnowing: Rabin-Karp gram hash + window minima, all map-side"),

    // ---------------------------------------------------------------
    // Winnow near-dup candidates: inverted-index self-join on
    // fingerprint with a hot-fingerprint cap (df <= 20) — the linear
    // discovery shape; shared-count >= 2 prunes accidental collisions.
    // ---------------------------------------------------------------
    Q("q50_winnow_pairs",
      (s, dir) => {
        // the fingerprint pipeline feeds the df-cap agg AND both join
        // sides — persist so it runs once, not three times
        val fps = TextAnalysis.winnowFingerprints(
          Tables(s, dir, "documents"), "doc_id", "text").persist()
        TextAnalysis.winnowCandidates(fps, "doc_id", maxDf = 20, minShared = 2)
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH $winnowCte,
        rare AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 20),
        p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM f a
              JOIN f b ON b.fp = a.fp AND a.doc_id < b.doc_id
              JOIN rare r ON r.fp = a.fp)
        SELECT id_a, id_b, count(*) AS shared
        FROM p GROUP BY 1, 2 HAVING count(*) >= 2
        ORDER BY id_a, id_b"""),
      "inverted-index join on winnow fingerprints, hot-key capped"),

    // ---------------------------------------------------------------
    // Count-min heavy hitters: the frequency member of the mergeable-
    // sketch family (HLL=q54, quantile=q71, bloom=q68). The oracle
    // rebuilds the SAME sketch (buckets generated from the same frozen
    // seeds/width) so estimates compare exactly; the exact count rides
    // along to show the overestimate-only contract (est >= exact,
    // equal when no full-collision — the regime at this width).
    // ---------------------------------------------------------------
    Q("q74_heavy_hitters",
      (s, dir) => {
        // deliberately NOT persisted: the explode is recomputed by the
        // sketch build, the probe pass, and the exact rider — three
        // map-side scans, which at corpus scale is far cheaper than
        // materializing an exploded token table in cache (the one thing
        // you'd never do at 100 TB; the exact count is oracle
        // scaffolding, not part of the production shape)
        val toks = Tables(s, dir, "documents")
          .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        val hh = graft.ops.FreqSketch.heavyHitters(
          toks, "token", width = cmsWidth, depth = cmsDepth, minCount = cmsMin)
        val exact = toks.groupBy("token").agg(count(lit(1)).as("exact"))
        hh.join(exact, "token")
          .select("token", "est", "exact")
          .orderBy("token")
      },
      Some {
        val sk = (0 until cmsDepth).map { r =>
          s"""SELECT $r AS depth, ${graft.ops.FreqSketch.sqlBucket("token", r, cmsWidth)} AS bucket,
                     count(*) AS cnt FROM tok GROUP BY 1, 2"""
        }.mkString(" UNION ALL ")
        val pb = (0 until cmsDepth).map { r =>
          s"""SELECT token, $r AS depth,
                     ${graft.ops.FreqSketch.sqlBucket("token", r, cmsWidth)} AS bucket FROM probes"""
        }.mkString(" UNION ALL ")
        s"""
        WITH tok AS (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS token
                     FROM documents),
        sk AS ($sk),
        probes AS (SELECT DISTINCT token FROM tok),
        pb AS ($pb),
        est AS (SELECT token, min(cnt) AS est
                FROM pb JOIN sk USING (depth, bucket) GROUP BY 1),
        exact AS (SELECT token, count(*) AS exact FROM tok GROUP BY 1)
        SELECT token, est, exact FROM est JOIN exact USING (token)
        WHERE est >= $cmsMin ORDER BY token"""
      },
      "count-min sketch: depth×width counters, additive merge, min-over-rows estimate"),

    // ---------------------------------------------------------------
    // BM25 ranked retrieval (Okapi, Lucene idf). Postings are filtered
    // to the query's terms BEFORE any aggregation, so the tf/df
    // shuffles carry per-term (not per-corpus) cardinality; N+avgdl
    // are a one-row broadcast, df a ≤|terms|-row broadcast.
    // ---------------------------------------------------------------
    Q("q75_bm25",
      (s, dir) => TextAnalysis.bm25(Tables(s, dir, "documents"),
          "doc_id", "text", bm25Terms, k1 = 1.2, b = 0.75, topK = 20)
        .select("doc_id", "score", "n_terms_hit"),
      Some {
        val termList = bm25Terms.map(t => s"'$t'").mkString(", ")
        s"""
        WITH d AS (SELECT doc_id,
                          len(string_split_regex(lower(text), '\\s+'))::DOUBLE AS dl
                   FROM documents),
        corpus AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM d),
        post AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token
                 FROM documents),
        fpost AS (SELECT * FROM post WHERE token IN ($termList)),
        tf AS (SELECT doc_id, token, count(*)::DOUBLE AS tf FROM fpost GROUP BY 1, 2),
        dfq AS (SELECT token, count(DISTINCT doc_id)::DOUBLE AS df FROM fpost GROUP BY 1)
        SELECT doc_id,
               round(sum(ln(1.0 + (c.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                         * tf.tf * 2.2
                         / (tf.tf + 1.2 * (0.25 + 0.75 * d.dl / c.avgdl))), 4) AS score,
               count(*) AS n_terms_hit
        FROM tf JOIN dfq USING (token) JOIN d USING (doc_id) CROSS JOIN corpus c
        GROUP BY doc_id
        ORDER BY score DESC, doc_id LIMIT 20"""
      },
      "BM25: postings filtered to query terms pre-shuffle; broadcast df + corpus stats"),

    // ---------------------------------------------------------------
    // Conjunctive boolean retrieval: docs containing ALL query terms,
    // via distinct-postings intersection (groupBy-count over terms
    // hit). The isin filter is pushed into the scan.
    // ---------------------------------------------------------------
    Q("q76_bool_search",
      (s, dir) => TextAnalysis.searchConjunctive(Tables(s, dir, "documents"),
          "doc_id", "text", boolTerms)
        .orderBy("doc_id"),
      Some {
        val termList = boolTerms.map(t => s"'$t'").mkString(", ")
        s"""
        WITH post AS (SELECT DISTINCT doc_id,
                             unnest(string_split_regex(lower(text), '\\s+')) AS token
                      FROM documents)
        SELECT doc_id, count(*) AS n_terms_hit
        FROM post WHERE token IN ($termList)
        GROUP BY 1 HAVING count(*) = ${boolTerms.size}
        ORDER BY doc_id"""
      },
      "postings-intersection AND-search; one shuffle on doc id"),

    // ---------------------------------------------------------------
    // Bounded per-group top-k via a mergeable Aggregator: the buffer
    // holds at most k entries, so the partial→final shuffle carries
    // ≤ k rows per (group × map partition) instead of sorting every
    // row per group like the window-function form the oracle uses.
    // ---------------------------------------------------------------
    Q("q77_grouped_topk",
      (s, dir) => {
        val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
        ev.groupBy("event_type")
          .agg(graft.functions.TopKAggregator.topK(3, col("value"), col("event_id")).as("top"))
          .select(col("event_type"), posexplode(col("top")))
          .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
            col("col.value").as("value"), col("col.tag").as("event_id"))
          .orderBy("event_type", "rank")
      },
      Some("""
        SELECT event_type, rank, value, event_id FROM (
          SELECT event_type,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS rank,
                 value, event_id
          FROM events WHERE value IS NOT NULL)
        WHERE rank <= 3 ORDER BY event_type, rank"""),
      "map-side bounded top-k partials vs the oracle's full per-group sort"),

    // ---------------------------------------------------------------
    // Bigram LM quality score (CCNet-style perplexity filter): add-one
    // smoothed bigram log-probs trained on the corpus itself, mean per
    // document. Count tables are corpus aggregations that merge by
    // addition; the scoring pass is two keyed joins + one broadcast.
    // ---------------------------------------------------------------
    Q("q82_lm_score",
      (s, dir) => TextAnalysis.lmScore(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""
        WITH tok AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
                     FROM documents),
        bg AS (SELECT doc_id,
                      unnest([t[i] for i in range(1, len(t))]) AS w1,
                      unnest([t[i + 1] for i in range(1, len(t))]) AS w2
               FROM tok WHERE len(t) >= 2),
        c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        c1 AS (SELECT w1, count(*) AS c1
               FROM (SELECT unnest(t) AS w1 FROM tok) GROUP BY 1),
        v AS (SELECT count(*) AS v FROM c1)
        SELECT doc_id,
               round(avg(ln((c12 + 1)::DOUBLE / (c1 + v))), 4) AS lm_score,
               count(*) AS n_bigrams
        FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        GROUP BY 1 ORDER BY doc_id"""),
      "corpus-trained smoothed bigram log-prob mean; counts merge additively"),

    // ---------------------------------------------------------------
    // Frozen linear quality classifier (fastText-style inference):
    // logit thresholding, no sigmoid — exp() is not bit-stable across
    // engines, a monotone transform cannot change the decision, and
    // skipping it keeps the classification exactly oracle-checkable.
    // ---------------------------------------------------------------
    Q("q93_quality_classifier",
      (s, dir) => TextAnalysis.classifyQuality(Tables(s, dir, "documents"), "text")
        .select("doc_id", "logit", "keep")
        .orderBy("doc_id"),
      Some {
        val logit = sqlQualityLogit
        s"""
        WITH t AS (SELECT doc_id, text,
                          string_split_regex(lower(text), '\\s+') AS toks
                   FROM documents)
        SELECT doc_id, round($logit, 4) AS logit, ($logit) > 0 AS keep
        FROM t ORDER BY doc_id"""
      },
      "frozen-weight linear scorer over quality features; inference stays in codegen")
  )
}
