package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Curation, Dedup, DetHash, Multimodal, Similarity, TextAnalysis}

/** Dedup extension queries (SURVEY.md §7.5): exact / MinHash-LSH /
  * SimHash / n-gram Jaccard / fuzzy-join / connected-component
  * clusters / incremental fingerprints, plus content-defined chunking
  * and cross-doc shared-chunk dedup.
  *
  * Sketch oracles are EXACT, not rows-only: all hashing goes through
  * [[graft.ext.DetHash]] (md5-prefix integers) which evaluates to the
  * same values in DuckDB, and parts of the oracle SQL are *generated
  * from the same frozen constants* as the Spark plan, so the two
  * sides cannot drift. */
object DedupQueries {

  /** DuckDB shingle CTE shared by the dedup oracles: 3-word shingles. */
  private[queries] val shingleCte = """
    tok AS (SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS t
            FROM documents),
    sh AS (SELECT DISTINCT doc_id, source,
                  unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)]) AS shingle
           FROM tok WHERE len(t) >= 3)"""

  /** Generated MinHash signature select list (16 columns m0..m15),
    * applied over the pre-hashed `hv` column. */
  private[queries] val sqlSig: String =
    DetHash.minhashCoeffs.indices
      .map(j => s"min(${DetHash.sqlMinhash("hv", j)}) AS m$j")
      .mkString(", ")

  /** Generated band CTE: 4 bands × 4 rows, bucket = md5 of the band. */
  private[queries] val sqlBands: String =
    (0 until 4).map { b =>
      val cols = (0 until 4).map(r => s"m${b * 4 + r}::VARCHAR").mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, md5($cols) AS bucket FROM sig"
    }.mkString(" UNION ALL ")

  private val sqlAgree: String =
    DetHash.minhashCoeffs.indices.map(j => s"(sa.m$j = sb.m$j)::INT").mkString(" + ")

  /** Shared CDC oracle CTEs (k=8, divisor=64 over documents): rolling
    * gram hashes from the frozen winnow power table, cut positions
    * where hash ≡ 0 mod 64, and the resulting `chunks(doc_id,
    * chunk_no, chunk)` — used by q94 (the chunks themselves) and q101
    * (cross-doc shared-chunk dedup). */
  private val cdcCte = {
    val p = DetHash.P
    val pows = TextAnalysis.sqlWinnowPowers(8)
    s"""
        t AS (SELECT doc_id, text FROM documents),
        g AS (SELECT doc_id, text,
                     unnest(range(0, greatest(length(text) - 7, 0))) AS i
              FROM t),
        h AS (SELECT doc_id, i,
                     (list_sum([(ascii(substr(text, (i + j + 1)::INT, 1))
                                 * ($pows)[(j + 1)::INT]) % $p
                                for j in range(0, 8)]) % $p)::BIGINT AS hv
              FROM g),
        bl AS (SELECT doc_id, list(i ORDER BY i) AS bp
               FROM h WHERE hv % 64 = 0 AND i > 0 GROUP BY doc_id),
        c AS (SELECT t.doc_id, t.text,
                     [0]::BIGINT[] || coalesce(b.bp, []::BIGINT[]) AS ss,
                     coalesce(b.bp, []::BIGINT[]) || [length(t.text)]::BIGINT[] AS ee
              FROM t LEFT JOIN bl b USING (doc_id)),
        x AS (SELECT doc_id, text, ss, ee,
                     unnest(range(0, len(ss))) AS jj
              FROM c),
        chunks AS (SELECT doc_id, jj AS chunk_no,
                          substr(text, (ss[(jj + 1)::INT] + 1)::INT,
                                 (ee[(jj + 1)::INT] - ss[(jj + 1)::INT])::INT) AS chunk
                   FROM x)"""
  }

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // Dedup: exact
    // ---------------------------------------------------------------
    Q("q30_dedup_exact",
      (s, dir) => Dedup.exactGroups(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("fp"),
      Some("""
        SELECT md5(text) AS fp, count(*) AS n, min(doc_id) AS keeper
        FROM documents GROUP BY 1 ORDER BY 1"""),
      "exact dedup: one hash-shuffle, keeper = min id"),

    // ---------------------------------------------------------------
    // Dedup: n-gram Jaccard verify, fed from LSH candidates — the
    // discovery stage is never all-pairs; exact Jaccard runs only on
    // pairs that collide in a MinHash band (oracle mirrors the same
    // candidate generation).
    // ---------------------------------------------------------------
    Q("q31_jaccard_topk",
      (s, dir) => {
        // the shingle set feeds the signature AND both sides of the
        // intersection join — persist so the md5 sketch pipeline runs
        // once, not once per consumer (a few MB even at sf0.1)
        val sh = Dedup.shingles(Tables(s, dir, "documents"), "doc_id", "text", 3).persist()
        val sig = Dedup.minhashSignature(sh, "doc_id")
        Dedup.jaccardOnCandidates(sh, Dedup.candidatePairs(sig, "doc_id"), "doc_id")
          .orderBy(col("jaccard").desc, col("doc_id_a"), col("doc_id_b"))
          .limit(20)
      },
      Some(s"""
        WITH $shingleCte,
        h AS (SELECT doc_id, ${DetHash.sqlHash52("shingle")} AS hv FROM sh),
        sig AS (SELECT doc_id, $sqlSig FROM h GROUP BY doc_id),
        bands AS ($sqlBands),
        pairs AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bucket = b.bucket
                   AND a.doc_id < b.doc_id),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (SELECT p.doc_id_a, p.doc_id_b, count(*) AS inter
                  FROM pairs p
                  JOIN sh a ON a.doc_id = p.doc_id_a
                  JOIN sh b ON b.doc_id = p.doc_id_b AND b.shingle = a.shingle
                  GROUP BY 1, 2)
        SELECT doc_id_a, doc_id_b,
               round(inter::DOUBLE / (sa.sz + sb.sz - inter), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_id_a
        JOIN sizes sb ON sb.doc_id = doc_id_b
        ORDER BY jaccard DESC, doc_id_a, doc_id_b LIMIT 20"""),
      "exact Jaccard verify on MinHash-LSH candidate pairs (Dedup.candidatePairs -> jaccardOnCandidates)"),

    // ---------------------------------------------------------------
    // Dedup: MinHash + LSH candidate generation
    // ---------------------------------------------------------------
    Q("q32_minhash_lsh",
      (s, dir) => {
        val sh = Dedup.shingles(Tables(s, dir, "documents"), "doc_id", "text", 3)
        // signature feeds the band explode and both pair-join sides
        val sig = Dedup.minhashSignature(sh, "doc_id").persist()
        Dedup.minhashCandidates(sig, "doc_id")
          .orderBy("doc_id_a", "doc_id_b")
      },
      Some(s"""
        WITH $shingleCte,
        h AS (SELECT doc_id, ${DetHash.sqlHash52("shingle")} AS hv FROM sh),
        sig AS (SELECT doc_id, $sqlSig FROM h GROUP BY doc_id),
        bands AS ($sqlBands),
        pairs AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bucket = b.bucket
                   AND a.doc_id < b.doc_id)
        SELECT p.doc_id_a, p.doc_id_b,
               round(($sqlAgree) / 16.0, 4) AS est_jaccard
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_id_a
        JOIN sig sb ON sb.doc_id = p.doc_id_b
        ORDER BY doc_id_a, doc_id_b""")),

    // ---------------------------------------------------------------
    // MinHash scale path: same pipeline as q32 with the xxhash64-based
    // fast hash — the production shingle hash at 100 TB, where md5's
    // digest cost dominates the sketch. xxhash64 has no DuckDB twin, so
    // the oracle replays the q32 band/pair SQL over FROZEN golden
    // signatures (golden/minhash_fast_sig, generated once by
    // graft.GoldenGen, content-addressed by md5(text) so the same
    // table serves every sf). ExtSpec additionally property-pins the
    // fast path's candidate recall to the md5 path.
    // ---------------------------------------------------------------
    Q("q55_minhash_fast",
      (s, dir) => {
        val sh = Dedup.shingles(Tables(s, dir, "documents"), "doc_id", "text", 3)
        val sig = Dedup.minhashSignature(sh, "doc_id", fast = true).persist()
        Dedup.minhashCandidates(sig, "doc_id")
          .orderBy("doc_id_a", "doc_id_b")
      },
      Some(s"""
        WITH g AS (SELECT * FROM read_parquet(
                     '${sys.props("user.dir")}/golden/minhash_fast_sig/*.parquet')),
        sig AS (SELECT d.doc_id, ${DetHash.minhashCoeffs.indices
                  .map(j => s"g.m$j").mkString(", ")}
                FROM documents d JOIN g ON g.fp = md5(d.text)),
        bands AS ($sqlBands),
        pairs AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bucket = b.bucket
                   AND a.doc_id < b.doc_id)
        SELECT p.doc_id_a, p.doc_id_b,
               round(($sqlAgree) / 16.0, 4) AS est_jaccard
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_id_a
        JOIN sig sb ON sb.doc_id = p.doc_id_b
        ORDER BY doc_id_a, doc_id_b"""),
      "q32's minhash dedup on the xxhash64 scale path (no md5 in the hot loop); oracle = frozen golden signatures"),

    // ---------------------------------------------------------------
    // Dedup: SimHash signatures + near-dup pairs
    // ---------------------------------------------------------------
    Q("q33_simhash",
      (s, dir) => Dedup.simhash(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""
        WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token
                     FROM documents),
        tw AS (SELECT doc_id, token, count(*) AS w FROM tok GROUP BY 1, 2),
        th AS (SELECT doc_id, w, ${DetHash.sqlHash32("token")} AS h FROM tw),
        bits AS (SELECT doc_id, b.range AS b,
                   CASE WHEN sum(w * (((h >> b.range::INT) & 1) * 2 - 1)) >= 0
                        THEN 1::BIGINT ELSE 0::BIGINT END AS bit
                 FROM th CROSS JOIN range(0, 32) b
                 GROUP BY doc_id, b.range)
        SELECT doc_id, sum(bit << b::INT)::BIGINT AS simhash
        FROM bits GROUP BY doc_id ORDER BY doc_id""")),

    // Banded plan (default): 3 disjoint bands of the 32-bit signature;
    // pigeonhole guarantees every Hamming<=2 pair collides in a band, so
    // the all-pairs oracle below provably matches the equi-join plan.
    Q("q34_simhash_pairs",
      (s, dir) => {
        val sh = Dedup.simhash(Tables(s, dir, "documents"), "doc_id", "text")
        Dedup.simhashPairs(sh, "doc_id", maxHamming = 2)
          .orderBy("doc_id_a", "doc_id_b")
      },
      Some(s"""
        WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS token
                     FROM documents),
        tw AS (SELECT doc_id, token, count(*) AS w FROM tok GROUP BY 1, 2),
        th AS (SELECT doc_id, w, ${DetHash.sqlHash32("token")} AS h FROM tw),
        bits AS (SELECT doc_id, b.range AS b,
                   CASE WHEN sum(w * (((h >> b.range::INT) & 1) * 2 - 1)) >= 0
                        THEN 1::BIGINT ELSE 0::BIGINT END AS bit
                 FROM th CROSS JOIN range(0, 32) b
                 GROUP BY doc_id, b.range),
        sim AS (SELECT doc_id, sum(bit << b::INT)::BIGINT AS simhash
                FROM bits GROUP BY doc_id)
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
        ORDER BY doc_id_a, doc_id_b""")),

    // ---------------------------------------------------------------
    // Dedup clusters: connected components over the q32 MinHash-LSH
    // candidate pairs — min-label propagation; the cluster label is the
    // canonical keeper. Oracle: recursive-CTE reachability closure over
    // the IDENTICAL pair set.
    // ---------------------------------------------------------------
    Q("q63_dedup_clusters",
      (s, dir) => {
        val sh = Dedup.shingles(Tables(s, dir, "documents"), "doc_id", "text", 3)
        val sig = Dedup.minhashSignature(sh, "doc_id").persist()
        Dedup.connectedComponents(
            Dedup.candidatePairs(sig, "doc_id"), "doc_id_a", "doc_id_b")
          .select(col("node").as("doc_id"), col("cluster"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH RECURSIVE $shingleCte,
        h AS (SELECT doc_id, ${DetHash.sqlHash52("shingle")} AS hv FROM sh),
        sig AS (SELECT doc_id, $sqlSig FROM h GROUP BY doc_id),
        bands AS ($sqlBands),
        pairs AS (SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bucket = b.bucket
                   AND a.doc_id < b.doc_id),
        edges AS (SELECT doc_id_a AS s, doc_id_b AS d FROM pairs
                  UNION SELECT doc_id_b, doc_id_a FROM pairs),
        reach AS (SELECT s AS node, s AS lbl FROM edges
                  UNION
                  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.node)
        SELECT node AS doc_id, min(lbl) AS cluster
        FROM reach GROUP BY 1 ORDER BY 1"""),
      "connected components via min-label propagation; label = keeper id"),

    // ---------------------------------------------------------------
    // Dedup: paragraph granularity — first occurrence of each 32-token
    // window survives corpus-wide, docs reassemble from survivors.
    // The middle ground between q30 (whole-doc) and q31/q32 (near-dup).
    // ---------------------------------------------------------------
    Q("q67_paragraph_dedup",
      (s, dir) => Dedup.dedupParagraphs(
          Tables(s, dir, "documents"), "doc_id", "text", paraTokens = 32)
        .orderBy("doc_id"),
      Some("""
        WITH tk AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
                    FROM documents),
        p AS (SELECT doc_id, t,
                     unnest(range(0, greatest((len(t) - 1) // 32, 0) + 1)) AS para_no
              FROM tk),
        pt AS (SELECT doc_id, para_no,
                      array_to_string(t[(para_no * 32 + 1)::INT:((para_no + 1) * 32)::INT],
                                      ' ') AS para_text
               FROM p),
        k AS (SELECT doc_id, para_no, para_text,
                     row_number() OVER (PARTITION BY md5(para_text)
                                        ORDER BY doc_id, para_no) = 1 AS keep
              FROM pt)
        SELECT doc_id, count(*) AS n_paras,
               count(*) FILTER (WHERE keep) AS n_kept,
               md5(coalesce(string_agg(para_text, ' ' ORDER BY para_no)
                              FILTER (WHERE keep), '')) AS dedup_md5
        FROM k GROUP BY 1 ORDER BY 1"""),
      "paragraph dedup: window on para fp + reassembly groupBy, both equi-shuffles"),

    // ---------------------------------------------------------------
    // Dedup: INCREMENTAL — a new batch dedups against the kept
    // history's fingerprints (never its text) plus itself. Natural
    // exact dups are absent at the gate scales (and rare at sf0.1),
    // so the increment PLANTS two kinds: copies of history docs (must
    // drop via the anti-join) and a second copy of some fresh docs
    // (must drop via the in-increment window; the original id wins).
    // ---------------------------------------------------------------
    Q("q73_dedup_increment",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val history = docs.filter(col("doc_id") % 3 =!= 0)
        val fresh = docs.filter(col("doc_id") % 3 === 0)
          .select("doc_id", "text")
        val increment = fresh
          .unionByName(history.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 100000).as("doc_id"), col("text")))
          .unionByName(fresh.filter(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 200000).as("doc_id"), col("text")))
        Dedup.dedupIncrement(increment,
            Dedup.exactGroups(history, "doc_id", "text").select("fp"),
            "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""
        WITH hist AS (SELECT md5(text) AS fp FROM documents WHERE doc_id % 3 <> 0),
        inc AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id + 100000, text FROM documents
          WHERE doc_id % 3 <> 0 AND doc_id % 5 = 0
          UNION ALL
          SELECT doc_id + 200000, text FROM documents
          WHERE doc_id % 3 = 0 AND doc_id % 7 = 0
        ),
        k AS (SELECT doc_id, md5(text) AS fp,
                     row_number() OVER (PARTITION BY md5(text)
                                        ORDER BY doc_id) AS r
              FROM inc
              -- NOT EXISTS, not NOT IN: matches left_anti's NULL
              -- semantics (a null fp is kept, and a null in hist
              -- doesn't poison the whole predicate)
              WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = md5(inc.text)))
        SELECT doc_id, fp FROM k WHERE r = 1 ORDER BY doc_id"""),
      "increment anti-joins history FINGERPRINTS + dedups itself; old text never re-read"),

    // ---------------------------------------------------------------
    // Fuzzy (edit-distance ≤ 1) self-join via symmetric-delete banding
    // — the SymSpell rewrite of the O(n²) levenshtein cross-join into
    // a variant equi-join + exact verify. The oracle IS the all-pairs
    // form, so the green row proves the banded plan's exact recall.
    // ---------------------------------------------------------------
    Q("q84_fuzzy_join",
      (s, dir) => Dedup.fuzzyPairsEd1(
          Tables(s, dir, "part").select("p_name").distinct(), "p_name")
        .orderBy("str_a", "str_b"),
      Some("""
        WITH n AS (SELECT DISTINCT p_name FROM part WHERE length(p_name) >= 3)
        SELECT a.p_name AS str_a, b.p_name AS str_b
        FROM n a JOIN n b ON a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 1
        ORDER BY str_a, str_b"""),
      "symmetric-delete variant equi-join == all-pairs levenshtein oracle"),

    // ---------------------------------------------------------------
    // Exact duplicated-substring-span dedup (token granularity): every
    // 8-token span occurring more than once corpus-wide marks its
    // tokens; covered tokens are cut and the remainder reassembled.
    // The "dedup repeated substrings, not whole docs" stage — catches
    // boilerplate wherever it sits, no chunk/paragraph alignment
    // needed. One fingerprint-window shuffle; no cached explode.
    // ---------------------------------------------------------------
    Q("q112_substring_dedup",
      (s, dir) => Dedup.dedupSpans(
          Tables(s, dir, "documents"), "doc_id", "text", k = 8)
        .orderBy("doc_id"),
      Some("""
        WITH tk AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
                    FROM documents),
        w AS (SELECT doc_id, t, unnest(range(0, greatest(len(t) - 7, 0))) AS i
              FROM tk),
        g AS (SELECT doc_id, i,
                     md5(array_to_string(t[(i + 1)::INT:(i + 8)::INT], ' ')) AS fp
              FROM w),
        d AS (SELECT fp FROM g GROUP BY fp HAVING count(*) >= 2),
        cov AS (SELECT DISTINCT doc_id, unnest(range(i, i + 8)) AS pos
                FROM g JOIN d USING (fp)),
        cl AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM cov GROUP BY doc_id),
        r AS (SELECT tk.doc_id, tk.t, coalesce(cl.ps, []::BIGINT[]) AS ps
              FROM tk LEFT JOIN cl USING (doc_id))
        SELECT doc_id,
               len(t)::BIGINT AS n_tokens,
               len(ps)::BIGINT AS n_dup_tokens,
               (CASE WHEN len(ps) = 0 THEN 0
                     ELSE len([i for i in range(0, len(ps))
                               if i = 0 OR ps[(i + 1)::INT] - ps[i::INT] > 1])
                END)::BIGINT AS dup_spans,
               -- coalesce: DuckDB's array_to_string([]) is NULL, but a
               -- fully-covered doc's remainder is the EMPTY string (md5
               -- d41d8cd9...), matching Spark's concat_ws semantics
               md5(coalesce(
                 array_to_string([t[(p + 1)::INT] for p in range(0, len(t)::BIGINT)
                                  if not list_contains(ps, p)], ' '), '')) AS dedup_md5
        FROM r ORDER BY doc_id"""),
      "duplicated k-token spans cut corpus-wide (Lee-et-al-style substring dedup); one fp-window shuffle"),

    // ---------------------------------------------------------------
    // Content-defined chunking: boundaries where the rolling k-gram
    // hash ≡ 0 mod divisor — insertion-robust chunks for chunk-level
    // dedup (fixed windows shift every later chunk; CDC re-chunks only
    // the edit's neighborhood). The oracle recomputes every gram hash
    // from the same frozen power table and rebuilds the exact cuts.
    // ---------------------------------------------------------------
    Q("q94_cdc_chunks",
      (s, dir) => Curation.cdcChunks(
          Tables(s, dir, "documents"), "doc_id", "text", k = 8, divisor = 64)
        .orderBy("doc_id", "chunk_no"),
      Some(s"""
        WITH $cdcCte
        SELECT doc_id, chunk_no, chunk
        FROM chunks ORDER BY doc_id, chunk_no"""),
      "content-defined chunking: rolling-hash cuts, insertion-robust, O(len) codegen"),

    // ---------------------------------------------------------------
    // Chunk-level cross-doc dedup over CDC chunks — the reason CDC
    // exists: boilerplate shared between documents surfaces as
    // identical chunk fingerprints even when the surrounding text
    // differs (fixed windows would mis-align after any edit). Per-doc
    // report: chunks, chunks shared with another doc, shared-char
    // ratio.
    // ---------------------------------------------------------------
    Q("q101_cdc_shared_chunks",
      (s, dir) => {
        val f = Curation.cdcChunks(
            Tables(s, dir, "documents"), "doc_id", "text", k = 8, divisor = 64)
          .select(col("doc_id"),
            md5(col("chunk").cast("binary")).as("fp"),
            length(col("chunk")).as("len"))
        val sh = f.groupBy("fp")
          .agg(count_distinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2)
          .select(col("fp"), lit(1).as("__shared"))
        f.join(sh, Seq("fp"), "left")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_chunks"),
            count(col("__shared")).as("n_shared"),
            round(coalesce(
                sum(when(col("__shared").isNotNull, col("len"))), lit(0))
              .cast("double") / sum(col("len")), 4).as("shared_ratio"))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH $cdcCte,
        f AS (SELECT doc_id, md5(chunk) AS fp, length(chunk) AS len FROM chunks),
        sh AS (SELECT fp FROM f GROUP BY fp HAVING count(DISTINCT doc_id) >= 2)
        SELECT f.doc_id, count(*) AS n_chunks,
               count(s.fp) AS n_shared,
               round(coalesce(sum(f.len) FILTER (s.fp IS NOT NULL), 0)::DOUBLE
                     / sum(f.len), 4) AS shared_ratio
        FROM f LEFT JOIN sh s ON s.fp = f.fp
        GROUP BY f.doc_id ORDER BY f.doc_id"""),
      "cross-doc boilerplate via shared CDC chunk fingerprints"),

    // ---------------------------------------------------------------
    // EXACT set-similarity self-join via prefix filtering (the
    // PPJoin candidate core) — the deterministic complement to the
    // MinHash-LSH family above: all pairs with shingle-Jaccard ≥ 0.7,
    // zero missed pairs, no all-pairs stage. Rare-first global
    // ordering keeps prefix elements unshared: 124,750 possible pairs
    // → 26 candidates at sf0.01. Everything is an equi-join (prefix
    // element, then (id, shingle)), so the shape survives 100×.
    // ---------------------------------------------------------------
    Q("q150_prefix_ssjoin",
      (s, dir) => {
        // persisted: the shingle set feeds frequency, prefix, and both
        // verify sides; the harness's clearCache() drops it per query
        val sh = Dedup.shingles(Tables(s, dir, "documents"), "doc_id", "text", 3)
          .persist()
        Dedup.prefixSimilarityJoin(sh, "doc_id", 0.7)
          .orderBy("id_a", "id_b")
      },
      Some(s"""
        WITH $shingleCte,
        freq AS (SELECT shingle, count(*) AS f FROM sh GROUP BY 1),
        ordered AS (SELECT doc_id, shingle,
            row_number() OVER (PARTITION BY doc_id ORDER BY f, shingle) AS rn,
            count(*) OVER (PARTITION BY doc_id) AS s
          FROM sh JOIN freq USING (shingle)),
        pref AS (SELECT doc_id, shingle, s FROM ordered
                 WHERE rn <= s - ceil(0.7 * s) + 1),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                        a.s AS sa, b.s AS sb
          FROM pref a JOIN pref b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE b.s >= ceil(0.7 * a.s) AND a.s >= ceil(0.7 * b.s)),
        inter AS (SELECT c.id_a, c.id_b, c.sa, c.sb, count(*) AS i
          FROM cand c
          JOIN sh ta ON ta.doc_id = c.id_a
          JOIN sh tb ON tb.doc_id = c.id_b AND tb.shingle = ta.shingle
          GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b,
               round(10000.0 * i / (sa + sb - i))::BIGINT AS jac_bp
        FROM inter
        WHERE i::DOUBLE / (sa + sb - i) >= 0.7
        ORDER BY id_a, id_b"""),
      "exact prefix-filtered set-similarity join: every Jaccard>=0.7 shingle pair, candidates from a rare-first prefix equi-join")
  )
}
