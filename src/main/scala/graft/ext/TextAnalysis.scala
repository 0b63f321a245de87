package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting,
  * tf-idf. All pure Catalyst expressions / DataFrame ops — no UDFs — so
  * they stay codegen'd and scale linearly with a single shuffle at most
  * (tf-idf's document-frequency join).
  */
object TextAnalysis {

  /** Whitespace tokenization, lower-cased. Kept trivially simple so the
    * DuckDB oracle (`string_split_regex(lower(x), '\s+')`) is
    * semantically identical. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Language-marker stopword lists for the n-gram/stopword-ratio
    * language-ID heuristic. Frozen — they define the classifier. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不"))

  /** Count of tokens that appear in a marker list (dups counted). */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Language-ID: per-language marker-hit scores + argmax with a fixed
    * tie-break order (the order of [[langMarkers]]). */
  def withLangScores(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    langMarkers.foldLeft(df) { case (d, (lang, markers)) =>
      d.withColumn(s"score_$lang", markerHits(toks, markers))
    }
  }

  def predictedLang: Column = {
    val scores = langMarkers.map { case (l, _) => l -> col(s"score_$l") }
    val best = greatest(scores.map(_._2): _*)
    scores.tail.foldLeft(when(scores.head._2 === best, scores.head._1)) {
      case (acc, (l, c)) => acc.when(c === best, l)
    }
  }

  /** Quality metrics: token count, mean token length, punctuation /
    * digit / stopword ratios, and a composite score. */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val totTokLen = aggregate(transform(toks, x => length(x)), lit(0), (acc, v) => acc + v)
    val punct = length(t) - length(regexp_replace(t, "[^a-zA-Z0-9\\s]", ""))
    val digits = length(t) - length(regexp_replace(t, "[0-9]", ""))
    val stop = markerHits(toks, langMarkers.head._2)
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("mean_token_len", round(totTokLen.cast("double") / nTok, 4))
      .withColumn("punct_ratio", round(punct.cast("double") / length(t), 4))
      .withColumn("digit_ratio", round(digits.cast("double") / length(t), 4))
      .withColumn("stopword_ratio", round(stop.cast("double") / nTok, 4))
      .withColumn("quality_score",
        round(lit(0.5) * (stop.cast("double") / nTok)
          + lit(0.3) * (lit(1.0) - punct.cast("double") / length(t))
          + lit(0.2) * least(nTok.cast("double") / 100.0, lit(1.0)), 4))
  }

  /** Frozen coefficients for [[classifyQuality]] — a fastText-style
    * linear model over the [[qualityMetrics]] features. Training
    * happens OFFLINE (these are arbitrary-but-frozen stand-ins for
    * fitted weights; swap after a real fit); the engine's job is
    * inference at corpus scale, which stays in whole-stage codegen
    * because the model is a dot product over expression-derived
    * features. Feature order: stopword_ratio, punct_ratio,
    * digit_ratio, mean_token_len/10, min(n_tokens/100, 1). */
  val qualityClassifierWeights: Seq[Double] =
    Seq(3.2, -2.1, -1.4, 0.6, 1.1)
  val qualityClassifierBias: Double = -1.05

  /** Linear quality classifier inference: `logit = w · x + b` over the
    * quality features, `keep = logit > 0`. No sigmoid on purpose — the
    * decision is monotone in the logit, and exp() is not bit-stable
    * across engines, so thresholding the logit keeps the operator
    * exactly oracle-checkable (apply sigmoid downstream if calibrated
    * probabilities are needed). Pure map-side expressions. */
  def classifyQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks).cast("double")
    val totTokLen = aggregate(transform(toks, x => length(x)), lit(0),
      (acc, v) => acc + v).cast("double")
    val punct = (length(t) - length(regexp_replace(t, "[^a-zA-Z0-9\\s]", "")))
      .cast("double")
    val digits = (length(t) - length(regexp_replace(t, "[0-9]", "")))
      .cast("double")
    val stop = markerHits(toks, langMarkers.head._2).cast("double")
    val feats = Seq(
      stop / nTok,
      punct / length(t),
      digits / length(t),
      totTokLen / nTok / 10.0,
      least(nTok / 100.0, lit(1.0)))
    val logit = feats.zip(qualityClassifierWeights)
      .map { case (f, w) => f * lit(w) }
      .foldLeft(lit(qualityClassifierBias): Column)(_ + _)
    df.withColumn("logit", round(logit, 4))
      .withColumn("keep", logit > 0)
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs, digit runs, single punctuation marks). */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("ws_tokens", size(tokens(t)).cast("long"))
      .withColumn("bpe_tokens",
        regexp_count(lower(t), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long"))
  }

  /** Document fingerprint: md5 of the punctuation/case/whitespace
    * normalized text, plus its 52-bit integer form for bucketing. */
  def fingerprint(df: DataFrame, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " "))
    df.withColumn("fp", md5(norm.cast("binary")))
      .withColumn("fp_int", DetHash.hash52(norm))
  }

  // ---------------------------------------------------------------
  // Winnowing fingerprints (rolling-hash document sketch).
  //
  // Classic scheme: normalize → k-char grams → polynomial (Rabin-Karp)
  // hash per gram → minimum per sliding window of w consecutive hashes
  // → the distinct selected minima are the document's fingerprint set.
  // Everything up to the final explode is per-row array expressions
  // inside codegen — zero shuffle over the corpus. Near-dup candidates
  // are then an inverted-index equi-join on fingerprint with a hot-key
  // cap ([[winnowCandidates]]), never an all-pairs product.
  // ---------------------------------------------------------------

  /** Rolling-hash base. h(gram) = Σⱼ ascii(gramⱼ)·B^(k-1-j) mod
    * [[DetHash.P]] — integer math only, so DuckDB reproduces it bit-
    * exactly from the same frozen powers. */
  val winnowBase: Long = 257L

  /** B^(k-1-j) mod P for j = 0..k-1 — the frozen power table shared by
    * the Spark plan and the generated oracle SQL. */
  def winnowPowers(k: Int): Seq[Long] =
    (0 until k).map(j =>
      (0 until k - 1 - j).foldLeft(1L)((a, _) => a * winnowBase % DetHash.P))

  /** DuckDB rendering of the power table as a BIGINT list literal. */
  def sqlWinnowPowers(k: Int): String =
    winnowPowers(k).mkString("[", ", ", "]::BIGINT[]")

  /** Winnowed fingerprint set, exploded to one row per (id, fp).
    *
    * Docs whose normalized text is shorter than `k` produce no rows.
    * Docs with fewer than `w` gram hashes contribute the single minimum
    * hash, the w-window minima otherwise.
    *
    * Hashing runs in the native O(len) rolling-hash expression
    * ([[graft.functions.WinnowFingerprints]]); the composed
    * higher-order-function pipeline ([[winnowFingerprintsComposed]])
    * is its bit-exact spec twin — the `PipelineProps` scalacheck
    * property pins them equal. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame =
    df.select(col(idCol),
        explode(graft.functions.WinnowFunctions.winnowFingerprints(
          regexp_replace(lower(col(textCol)), "[^a-z0-9]", ""), k, w)).as("fp"))

  /** The pre-native composed form (O(len·k) interpreted HOF lambdas) —
    * kept as the executable spec for the rolling-hash expression. */
  def winnowFingerprintsComposed(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    val pows = typedlit(winnowPowers(k))
    // Every stage materializes its column before the next stage's
    // lambda touches it: a lambda body that embedded the upstream
    // expression tree (e.g. the regexp normalization) would re-evaluate
    // it PER ELEMENT — measured 60× slower on sf0.1 — while a bound
    // column reference is O(1) per access.
    val norm = df.select(col(idCol),
      regexp_replace(lower(col(textCol)), "[^a-z0-9]", "").as("nm"))
    val codes = norm.select(col(idCol),
      when(length(col("nm")) >= k,
        transform(sequence(lit(1), length(col("nm"))), p =>
          ascii(col("nm").substr(p, lit(1))).cast("long")))
        .otherwise(array().cast("array<bigint>")).as("codes"))
    val hashes = codes.select(col(idCol),
      when(size(col("codes")) >= k,
        transform(sequence(lit(0), size(col("codes")) - k), i =>
          aggregate(sequence(lit(0), lit(k - 1)), lit(0L), (acc, j) =>
            acc + (element_at(col("codes"), (i + j + 1).cast("int"))
              * element_at(pows, (j + 1).cast("int"))) % DetHash.P) % DetHash.P))
        .otherwise(array().cast("array<bigint>")).as("hashes"))
    val mins = when(size(col("hashes")) === 0, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), greatest(size(col("hashes")) - w, lit(0))),
        jj => array_min(slice(col("hashes"), jj + 1, lit(w))))))
    hashes.select(col(idCol), explode(mins).as("fp"))
  }

  /** Near-dup candidate pairs from winnow fingerprints: inverted-index
    * self-join on `fp`, with fingerprints shared by more than `maxDf`
    * docs dropped first (stop-gram removal — the skew/hot-key cap that
    * keeps the join linear at corpus scale). */
  def winnowCandidates(fps: DataFrame, idCol: String,
      maxDf: Int, minShared: Int): DataFrame = {
    val rare = fps.groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("fp")
    val filtered = fps.join(rare, "fp")
    val a = filtered.toDF("fp", "id_a")
    val b = filtered.toDF("fp", "id_b")
    a.join(b, "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Bigram language-model quality score (the CCNet-style perplexity
    * filter): train add-one-smoothed bigram probabilities on the corpus
    * itself, then score each document by the mean log-probability of
    * its bigrams — repetitive or templated text scores HIGH (its
    * bigrams are corpus-frequent), word salad scores LOW.
    *
    * score(d) = mean over bigrams (w1,w2) of
    *   ln( (c(w1,w2) + 1) / (c(w1) + V) )
    * with V = distinct-unigram count.
    *
    * Shape: bigram and unigram count tables are corpus aggregations
    * (one shuffle each, map-side combined); the per-doc score joins
    * each document bigram to the two count tables — both keyed joins,
    * with the unigram side dim-sized (vocabulary) and V a one-row
    * broadcast. No all-pairs stage; the model "training" IS the
    * counting, so increments can reuse persisted count partials (they
    * merge by addition like every sketch here).
    *
    * Skew: `w1` is Zipf-distributed — stopwords are a constant fraction
    * of ALL bigram occurrences, so a plain equi-join to the unigram
    * counts stragglers on the "the"/"of" partitions at scale. The head
    * of the distribution is tiny by the same law, so the top `headK`
    * unigrams broadcast (left join, no shuffle) and only the tail —
    * whose keys are rare by construction — takes the shuffled join.
    * Identical results to the plain join; only the routing differs. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      headK: Int = 1024): DataFrame = {
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("t"))
    val bigrams = toks
      .select(col(idCol), explode(
        when(size(col("t")) >= 2,
          transform(sequence(lit(0), size(col("t")) - 2),
            i => struct(element_at(col("t"), i + 1).as("w1"),
              element_at(col("t"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bgCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uniCounts = toks.select(explode(col("t")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = uniCounts.agg(count(lit(1)).as("v"))
    // Join c1 onto the DISTINCT-bigram table, not onto occurrences:
    // "the" meets uniCounts once per distinct successor (vocabulary
    // scale), not once per corpus occurrence — the w1 occurrence skew
    // never exists. Then the Zipf head of the enriched table (the heavy
    // PAIRS, "of the" etc.) broadcasts, so per-occurrence skew dies
    // map-side too; only rare pairs take the shuffled join.
    val enriched = bgCounts.join(uniCounts, Seq("w1"))
    val headPairs = enriched
      .orderBy(col("c12").desc, col("w1"), col("w2")).limit(headK)
    val viaHead = bigrams.join(broadcast(headPairs), Seq("w1", "w2"), "left")
    val hit = viaHead.filter(col("c12").isNotNull)
    val miss = viaHead.filter(col("c12").isNull).drop("c12", "c1")
      .join(enriched, Seq("w1", "w2"))
    hit.unionByName(miss)
      .crossJoin(broadcast(vocab))
      .groupBy(idCol)
      .agg(
        round(avg(log((col("c12") + 1).cast("double") / (col("c1") + col("v")))), 4)
          .as("lm_score"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Conjunctive boolean retrieval over the token inverted index:
    * documents containing ALL of `terms`. The postings "index" is the
    * distinct (token, doc) projection of the token explode; intersection
    * of the per-term postings lists is a groupBy-count over the terms
    * hit — one shuffle on doc id, with the `isin` pushed into the scan
    * so only matching postings ever leave the map side. Returns
    * (idCol, n_terms_hit) with n_terms_hit == terms.size for every row. */
  def searchConjunctive(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one search term")
    docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(col("token").isInCollection(terms))
      .select(idCol, "token").distinct()
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_terms_hit"))
      .filter(col("n_terms_hit") === terms.size)
  }

  /** BM25 ranked retrieval (Okapi, Lucene idf variant) for one query of
    * `terms` over the corpus.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)), dl = whitespace
    * token count, avgdl its corpus mean.
    *
    * Shape: the token explode is filtered to the query's terms BEFORE
    * any aggregation, so tf and df shuffles carry only matching
    * postings (per-term, not per-corpus, cardinality); doc length comes
    * from a map-side `size(tokens)` (no shuffle); N and avgdl are a
    * one-row broadcast; df (≤ |terms| rows) broadcasts onto tf. One
    * real shuffle on (doc, token), one on doc for the final sum. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    val withDl = docs.select(col(idCol), col(textCol),
      size(tokens(col(textCol))).cast("double").as("dl"))
    val corpus = withDl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val post = withDl.select(col(idCol), col("dl"),
        explode(tokens(col(textCol))).as("token"))
      .filter(col("token").isInCollection(terms))
    val tf = post.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val dfreq = post.select(col(idCol), col("token")).distinct()
      .groupBy("token").agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val termScore = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(corpus))
      .groupBy(idCol)
      .agg(round(sum(termScore), 4).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** tf-idf: term frequencies joined to document frequencies; idf =
    * ln(N / df). One explode + two aggregations. The tf ⋈ df join keys
    * on `token` with NO broadcast hint: at web scale the vocabulary is
    * 10⁸+ distinct tokens (a driver-OOM broadcast), so it shuffles —
    * and AQE still picks a broadcast at small scale on its own. Only
    * the one-row count is broadcast. */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String, topK: Int): DataFrame = {
    val tok = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val dfreq = tok.select(col(idCol), col("token")).distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("token"), col("tfidf"), col("rank"))
  }
}
