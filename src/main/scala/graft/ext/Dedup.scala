package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import DetHash._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. All are expressed as
  * DataFrame plans over deterministic hashes ([[DetHash]]) so each has an
  * exact DuckDB oracle.
  *
  * Scale notes (100 TB): exact dedup is one hash-shuffle; MinHash/LSH
  * candidate generation shuffles on (band, bucket) — never all-pairs;
  * SimHash pair generation bands the signature bits (pigeonhole: Hamming
  * ≤ k pairs agree on one of k+1 disjoint bands) so it too is an
  * equi-join. Exact-Jaccard verification runs on LSH candidates
  * ([[jaccardOnCandidates]]); the all-pairs forms ([[jaccardPairs]],
  * `smallData = true`) exist as small-data oracle twins only.
  */
object Dedup {

  /** Exact dedup groups: fingerprint → group size + keeper (min id).
    * One shuffle on the fingerprint. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("fp"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))

  /** All string pairs within edit distance 1, as an EQUI-join
    * (symmetric-delete banding — the SymSpell trick): each string
    * explodes into itself plus its one-character deletions; any two
    * strings at edit distance ≤ 1 (substitution, insertion, deletion,
    * or equality) share at least one variant, so the variant equi-join
    * finds every true pair and `levenshtein ≤ 1` verifies away the
    * collisions (variant sharing implies distance ≤ 2). The naive form
    * is an all-pairs O(n²) levenshtein cross-join; this shuffles on the
    * variant key with fan-out `len+1` per string. Very short strings
    * make hot variants (every single char deletes to ""), the usual
    * skew cap territory — `minLen` drops strings below it (an
    * ED-1-of-very-short-strings question is rarely meaningful anyway).
    * Pairs of DISTINCT strings only; feed `.distinct()` values. */
  def fuzzyPairsEd1(df: DataFrame, strCol: String, minLen: Int = 3): DataFrame = {
    val s = col(strCol)
    val deletions = transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))
    val variants = df
      .filter(s.isNotNull && length(s) >= minLen)
      .select(s.as("str"),
        explode(array_distinct(concat(array(s), deletions))).as("__variant"))
    val a = variants.toDF("str_a", "__variant")
    val b = variants.toDF("str_b", "__variant")
    a.join(b, "__variant")
      .filter(col("str_a") < col("str_b"))
      .select("str_a", "str_b").distinct()
      .filter(levenshtein(col("str_a"), col("str_b")) <= 1)
  }

  /** Distinct word n-gram shingles per document (plus optional carried
    * columns, e.g. a grouping key). Documents with fewer than n tokens
    * produce no shingles.
    *
    * The token array is materialized in its OWN projection before the
    * transform lambda references it: higher-order functions don't
    * codegen, so an inlined `split()` would be re-evaluated for every
    * `get()` of every element — O(len²) re-tokenization per document
    * (measured 10x the whole pipeline's cost at sf0.1). CollapseProject
    * keeps the split un-inlined because it is non-cheap and referenced
    * multiple times. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val toks = col("__toks")
    df.select((col(idCol) +: carry.map(col)) :+
        TextAnalysis.tokens(col(textCol)).as("__toks"): _*)
      .filter(size(toks) >= n)
      .select(
        (col(idCol) +: carry.map(col)) :+
        explode(transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(k => get(toks, i + lit(k))): _*)
        )).as("shingle"): _*)
      .distinct()
  }

  /** MinHash signature: one row per id with 16 minhash columns m0..m15.
    * Single aggregation over the shingle set. `fast = true` swaps the
    * md5-based [[DetHash.hash52]] for [[DetHash.fastHash52]] (xxhash64)
    * — the production path at scale, where the md5 digest per shingle ×
    * corpus size dominates the sketch cost. The md5 path stays the
    * default because it alone has an exact DuckDB oracle; both paths
    * share every downstream stage (banding, candidate join, verify) and
    * ExtSpec pins their recall equivalence on exact duplicates. */
  def minhashSignature(sh: DataFrame, idCol: String,
      fast: Boolean = false): DataFrame = {
    val hv = if (fast) fastHash52(col("shingle")) else hash52(col("shingle"))
    sh.groupBy(col(idCol))
      .agg(
        min(minhash(hv, 0)).as("m0"),
        (1 until minhashCoeffs.size).map(j => min(minhash(hv, j)).as(s"m$j")): _*)
  }

  /** LSH banding: 4 bands × 4 rows; bucket key = md5 of the band's
    * minhashes. Output long format (id, band, bucket) so candidate
    * generation is an equi-join (shuffle on (band, bucket)), never a
    * cross join. */
  def lshBuckets(sig: DataFrame, idCol: String, bands: Int = 4, rows: Int = 4): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => col(s"m${b * rows + r}").cast("string"))
      struct(lit(b).as("band"), md5(concat_ws("_", cols: _*).cast("binary")).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Distinct LSH candidate pairs: equi-join of the banded buckets with
    * itself — shuffles on (band, bucket), never all-pairs. */
  def candidatePairs(sig: DataFrame, idCol: String): DataFrame = {
    val buckets = lshBuckets(sig, idCol)
    val a = buckets.toDF(s"${idCol}_a", "band", "bucket")
    val b = buckets.toDF(s"${idCol}_b", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
      .select(s"${idCol}_a", s"${idCol}_b").distinct()
  }

  /** LSH candidate pairs + estimated Jaccard (fraction of the 16
    * minhashes that agree). */
  def minhashCandidates(sig: DataFrame, idCol: String): DataFrame = {
    val pairs = candidatePairs(sig, idCol)
    val sa = sig.toDF(sig.columns.map(c => if (c == idCol) s"${idCol}_a" else s"${c}_a"): _*)
    val sb = sig.toDF(sig.columns.map(c => if (c == idCol) s"${idCol}_b" else s"${c}_b"): _*)
    val agree = minhashCoeffs.indices
      .map(j => when(col(s"m${j}_a") === col(s"m${j}_b"), 1).otherwise(0))
      .reduce(_ + _)
    pairs.join(sa, s"${idCol}_a").join(sb, s"${idCol}_b")
      .select(
        col(s"${idCol}_a"), col(s"${idCol}_b"),
        round(agree.cast("double") / minhashCoeffs.size, 4).as("est_jaccard"))
  }

  /** Exact n-gram Jaccard for a GIVEN candidate pair set (the verify
    * stage of the LSH dedup pipeline, fed from [[candidatePairs]]):
    * |A∩B| via a shingle equi-join restricted to the candidates,
    * |A∪B| = |A|+|B|-|A∩B|. Shuffle cost is proportional to the
    * candidate count, not n² — pairs sharing no shingle drop out
    * (jaccard would be 0). */
  def jaccardOnCandidates(sh: DataFrame, cands: DataFrame, idCol: String): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(idCol).as(s"${idCol}_a"), col("shingle"))
    val b = sh.select(col(idCol).as("__idb"), col("shingle").as("shingle_b"))
    cands.select(s"${idCol}_a", s"${idCol}_b")
      .join(a, Seq(s"${idCol}_a"))
      .join(b, col(s"${idCol}_b") === col("__idb") && col("shingle") === col("shingle_b"))
      .groupBy(s"${idCol}_a", s"${idCol}_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.toDF(s"${idCol}_a", "sz_a"), s"${idCol}_a")
      .join(sizes.toDF(s"${idCol}_b", "sz_b"), s"${idCol}_b")
      .select(
        col(s"${idCol}_a"), col(s"${idCol}_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 4).as("jaccard"))
  }

  /** Exact n-gram Jaccard over ALL pairs within a group column —
    * quadratic in the hot-shingle case; small-data / oracle twin of
    * [[jaccardOnCandidates]]. */
  def jaccardPairs(sh: DataFrame, idCol: String, groupCol: String): DataFrame = {
    val std = sh.select(col(idCol), col(groupCol), col("shingle"))
    val sizes = std.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = std.toDF(s"${idCol}_a", groupCol, "shingle")
    val b = std.toDF(s"${idCol}_b", s"${groupCol}_b", "shingle_b")
    val inter = a.join(b,
        col("shingle") === col("shingle_b") &&
        col(groupCol) === col(s"${groupCol}_b") &&
        col(s"${idCol}_a") < col(s"${idCol}_b"))
      .groupBy(s"${idCol}_a", s"${idCol}_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF(s"${idCol}_a", "sz_a"), s"${idCol}_a")
      .join(sizes.toDF(s"${idCol}_b", "sz_b"), s"${idCol}_b")
      .select(
        col(s"${idCol}_a"), col(s"${idCol}_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 4).as("jaccard"))
  }

  /** Duplicate CLUSTERS from near-dup pairs: connected components by
    * iterative min-label propagation — each node starts labeled with
    * itself; every round, labels flow across edges and each node keeps
    * the minimum seen; fixpoint = components, and the label IS the
    * canonical keeper (min id), which is what a dedup pipeline keeps.
    *
    * Rounds needed = graph diameter; near-dup graphs are
    * micro-clusters (pairs/triples/stars), so 2–3 rounds converge.
    * Convergence is checked with one count per round (the only
    * actions), and each round is two equi-joins + a groupBy — no
    * driver-side graph. For adversarial long-chain graphs use the
    * large-star/small-star variant (halves diameter per round); not
    * needed for dedup workloads, documented here for the 100× case.
    * Input edges are undirected (a,b); output: (node, cluster) for
    * every node appearing in any edge. */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("cluster", col("node"))
      .persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // candidate labels: own + min over neighbors' current labels
      val viaEdges = sym
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("cluster", "nbr_cluster"), "dst")
        .select(col("src").as("node"), col("nbr_cluster").as("cluster"))
      val next = labels.unionAll(viaEdges)
        .groupBy("node").agg(min("cluster").as("cluster"))
        .persist()
      val changed = next.join(labels.withColumnRenamed("cluster", "old"),
        "node").filter(col("cluster") =!= col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    // mid-propagation labels are WRONG (one component reported as
    // several, each claiming a keeper) — fail loudly, never return them
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(graph diameter exceeds maxIter); raise maxIter or use a " +
          "star-contraction variant for long-chain graphs")
    sym.unpersist()
    // materialize and cut lineage, then release the loop's persist: the
    // returned frame must not leak cache NOR recompute the whole
    // iteration chain when the caller uses it
    val out = labels.localCheckpoint()
    labels.unpersist()
    out
  }

  /** Incremental exact dedup — the daily-ingest reality: which NEW
    * documents survive against an already-deduped HISTORY (and against
    * each other)? The history participates only as its fingerprint
    * column (what [[exactGroups]] materializes per increment — persist
    * those, never re-read old text), so the cost per increment is one
    * anti-join on the fp plus a first-occurrence window WITHIN the
    * increment. At 100 TB the anti-join's history side is a
    * fingerprint-only table a fraction of corpus size, and
    * [[graft.ops.BloomPrune]] composes in front of it when even that
    * shuffle needs shrinking. */
  def dedupIncrement(increment: DataFrame, historyFps: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("__fp").orderBy(col(idCol))
    increment
      .withColumn("__fp", md5(col(textCol).cast("binary")))
      .join(historyFps.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col(idCol), col("__fp").as("fp"))
  }

  /** Paragraph-level dedup: split each document into fixed
    * `paraTokens`-token windows ("paragraphs" — this corpus carries no
    * paragraph delimiter, so the fixed window is the configurable
    * splitting unit, same model as `Curation.chunkDocs`), keep only the
    * globally FIRST occurrence of each distinct paragraph (min
    * (doc_id, para_no) over all occurrences of its fingerprint), and
    * reassemble every document from its surviving paragraphs in order.
    * Returns one row per document: `n_paras`, `n_kept`, and
    * `dedup_md5` — the md5 of the reassembled text (byte-exact output
    * contract without shipping the full text through the compare).
    *
    * This is the standard LLM-pipeline middle ground between whole-doc
    * exact dedup ([[exactGroups]]) and shingle near-dup: boilerplate
    * paragraphs (headers, license blocks, navigation chrome) vanish
    * corpus-wide while unique prose survives. A doc whose every
    * paragraph was seen earlier reassembles to the empty string
    * (n_kept = 0) — the caller's drop signal.
    *
    * Scale: two shuffles, both equi — the first-occurrence window
    * partitions on the paragraph fingerprint (128-bit md5: uniform,
    * no hot keys beyond true duplicates), the reassembly groups on the
    * doc id. No all-pairs stage anywhere; duplicate-heavy fingerprints
    * skew the window partition only in proportion to the actual
    * duplication being removed. */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      paraTokens: Int): DataFrame = {
    require(paraTokens > 0, s"need paraTokens > 0, got $paraTokens")
    // the paragraph unit IS a zero-overlap chunk — reuse chunkDocs'
    // windowing (one slice arithmetic to keep in sync with the oracles
    // and the PipelineProps property that pins it)
    val paras = Curation.chunkDocs(
        df.select(col(idCol), col(textCol)), idCol, textCol,
        chunkTokens = paraTokens, overlap = 0)
      .select(col(idCol), col("chunk_no").as("para_no"),
        col("chunk_text").as("para_text"))
    val w = Window.partitionBy("__fp").orderBy(col(idCol), col("para_no"))
    paras
      .withColumn("__fp", md5(col("para_text").cast("binary")))
      .withColumn("__keep", row_number().over(w) === 1)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_paras"),
        count(when(col("__keep"), lit(1))).as("n_kept"),
        // collect_list skips the nulls the `when` leaves for dropped
        // paragraphs; array_sort orders by the struct's leading field
        // (para_no, unique per doc) → in-order reassembly
        md5(array_join(
          transform(
            array_sort(collect_list(when(col("__keep"),
              struct(col("para_no"), col("para_text"))))),
            s => s.getField("para_text")),
          " ").cast("binary")).as("dedup_md5"))
  }

  /** Exact duplicated-SUBSTRING-span dedup at token granularity — the
    * middle ground BELOW [[dedupParagraphs]]'s fixed windows: any
    * `k`-token span whose fingerprint occurs MORE THAN ONCE corpus-wide
    * (across documents or repeated within one) marks every token it
    * covers; covered tokens are removed and the remainder reassembled.
    * This is the "deduplicate repeated substrings, not whole documents"
    * pipeline stage (SURVEY §2.12 dedup family): boilerplate sentences,
    * license headers, and copy-pasted passages vanish wherever they sit,
    * without requiring chunk alignment (CDC) or whole-paragraph equality.
    *
    * Per document: `n_tokens`, `n_dup_tokens` (covered), `dup_spans`
    * (maximal merged runs of covered positions), and `dedup_md5` — md5
    * of the surviving tokens in order (byte-exact output contract
    * without shipping text through the compare; empty string when the
    * whole document was duplicated spans).
    *
    * Scale (100 TB): the window fan-out is ~len rows per doc (positions),
    * hashed map-side; duplication detection is ONE shuffle — a count
    * window partitioned by the 128-bit fingerprint (uniform keys; hot
    * fingerprints are exactly the duplication being removed) — with NO
    * self-join and NO cached exploded corpus. Coverage explodes k
    * positions per DUPLICATED window only, collapses via collect_set
    * (bounded by doc length) in one groupBy, and rejoins the tokenized
    * docs on the id equi-key; reassembly is a map-side array filter.
    * The tokenized base is scanned twice (windows branch + reassembly
    * join) — two linear column-pruned scans, deliberately NOT persisted:
    * caching an exploded/tokenized 100 TB corpus is the anti-pattern. */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 1, s"need span length k > 1, got $k")
    val toks = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
    // (id, i, fp): fingerprint of tokens [i, i+k) — __toks materialized
    // in its own projection BEFORE the per-position gets (see shingles'
    // O(len²) re-tokenization note)
    val wins = toks
      .filter(size(col("__toks")) >= k)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), size(col("__toks")) - k)).as("i"))
      .select(col(idCol), col("i"),
        md5(concat_ws(" ",
          (0 until k).map(j => get(col("__toks"), col("i") + lit(j))): _*)
          .cast("binary")).as("__fp"))
    // corpus-wide occurrence count per fingerprint: a count WINDOW over
    // the fp partition (one shuffle), not a groupBy + self-join re-scan
    val dupWins = wins
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("__fp")))
      .filter(col("__n") >= 2)
    val covArr = dupWins
      .select(col(idCol), explode(sequence(col("i"), col("i") + (k - 1))).as("pos"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("pos"))).as("__cov"))
    val c = coalesce(col("__cov"), array().cast("array<int>"))
    // maximal merged runs: position 0 always opens one; a gap > 1 from
    // the previous covered position opens another. get() is 0-based and
    // null-safe out of bounds (no ANSI element_at hazard); the i === 0
    // disjunct absorbs the null comparison at the first element.
    val spans = when(size(c) === 0, lit(0L)).otherwise(
      size(filter(sequence(lit(0), size(c) - 1),
        i => (i === 0) || (get(c, i) - get(c, i - 1) > 1))).cast("long"))
    toks.join(covArr, Seq(idCol), "left")
      .select(
        col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(c).cast("long").as("n_dup_tokens"),
        spans.as("dup_spans"),
        md5(array_join(
          filter(col("__toks"), (t, i) => !array_contains(c, i)), " ")
          .cast("binary")).as("dedup_md5"))
  }

  /** 32-bit SimHash: per-token 32-bit hash, per-bit weighted vote
    * (weight = token multiplicity), sign → bit. Expressed as an
    * explode over bit positions + two aggregations — no UDF, and the
    * bit explode is a constant 32× fan-out of the (doc, token) pairs. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("w"))
      .withColumn("h", hash32(col("token")))
    tok
      .select(col(idCol), col("w"), col("h"), explode(sequence(lit(0), lit(31))).as("b"))
      .groupBy(col(idCol), col("b"))
      .agg(sum(col("w") * expr("(shiftright(h, cast(b as int)) & 1) * 2 - 1")).as("vote"))
      .groupBy(col(idCol))
      .agg(sum(when(col("vote") >= 0,
        expr("shiftleft(cast(1 as bigint), cast(b as int))")).otherwise(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs by Hamming distance. Default is the BANDED
    * plan: the 32 signature bits are split into `maxHamming + 1`
    * disjoint bands, and by pigeonhole any pair within Hamming ≤
    * maxHamming agrees EXACTLY on at least one band — so an equi-join
    * on (band, band-bits) finds every qualifying pair (guaranteed 100%
    * recall, unlike prefix bucketing) while shuffling on band keys
    * instead of materializing n² rows. `smallData = true` keeps the
    * all-pairs cross join for tiny inputs where the band fan-out isn't
    * worth it; both forms return identical results. */
  def simhashPairs(sh: DataFrame, idCol: String, maxHamming: Int,
      smallData: Boolean = false): DataFrame = {
    def verify(cands: DataFrame): DataFrame = cands
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col(s"${idCol}_a"), col(s"${idCol}_b"), col("hamming").cast("long").as("hamming"))
    val a = sh.toDF(s"${idCol}_a", "sh_a")
    val b = sh.toDF(s"${idCol}_b", "sh_b")
    if (smallData)
      verify(a.crossJoin(b).filter(col(s"${idCol}_a") < col(s"${idCol}_b")))
    else {
      val nBands = maxHamming + 1
      val widths = (0 until nBands).map(i => 32 / nBands + (if (i < 32 % nBands) 1 else 0))
      val offsets = widths.scanLeft(0)(_ + _)
      def bandsOf(c: Column) = array((0 until nBands).map { i =>
        struct(lit(i).as("band"),
          shiftright(c, offsets(i)).bitwiseAND(lit((1L << widths(i)) - 1)).as("key"))
      }: _*)
      val banded = sh.toDF("__id", "__sh")
        .select(col("__id"), col("__sh"), explode(bandsOf(col("__sh"))).as("bk"))
        .select(col("__id"), col("__sh"), col("bk.band").as("band"), col("bk.key").as("key"))
      val ba = banded.toDF(s"${idCol}_a", "sh_a", "band", "key")
      val bb = banded.toDF(s"${idCol}_b", "sh_b", "band", "key")
      verify(ba.join(bb, Seq("band", "key"))
        .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
        .select(s"${idCol}_a", "sh_a", s"${idCol}_b", "sh_b").distinct())
    }
  }

  /** EXACT set-similarity self-join via prefix filtering (Chaudhuri et
    * al. 2006; the candidate-generation core of PPJoin, Xiao et al.
    * 2008) — the deterministic counterpart to the MinHash-LSH tier: no
    * probabilistic recall, every pair with Jaccard ≥ τ is returned.
    *
    * Elements are ordered GLOBALLY by (frequency asc, value asc); a set
    * of size s keeps its first `s − ⌈τ·s⌉ + 1` elements as its prefix.
    * Two sets with Jaccard ≥ τ must share a prefix element (pigeonhole
    * on the ⌈τ·s⌉ overlap), so candidates come from an EQUI-join on
    * prefix elements — never all pairs — with a symmetric size filter
    * (τ·sa ≤ sb ∧ τ·sb ≤ sa); exact Jaccard is then verified on the
    * full sets. Rare-first ordering makes prefix elements the least
    * shared ones, which is what bounds the join fan-out at scale (on
    * this corpus: 124,750 possible pairs → 26 candidates at τ=0.7).
    *
    * Input is a distinct (id, shingle) frame ([[shingles]]); output is
    * (id_a, id_b, jac_bp) for pairs with Jaccard ≥ τ, similarity in
    * basis points (integer rounding — the portable quantization).
    */
  def prefixSimilarityJoin(sh: DataFrame, idCol: String,
      tau: Double): DataFrame = {
    val freq = sh.groupBy("shingle").agg(count(lit(1)).as("__f"))
    val wRank = Window.partitionBy(col(idCol)).orderBy(col("__f"), col("shingle"))
    val wSize = Window.partitionBy(col(idCol))
    // persisted: both sides of the candidate self-join consume this
    // frame — uncached, the freq join + sort + two windows would run
    // twice (visible as a duplicated subtree in the physical plan);
    // the harness-level clearCache() reclaims it
    val pref = sh.join(freq, "shingle")
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__s", count(lit(1)).over(wSize))
      .filter(col("__rn") <= col("__s") - ceil(lit(tau) * col("__s")) + 1)
      .select(col(idCol), col("shingle"), col("__s"))
      .persist()
    val a = pref.select(col(idCol).as("id_a"), col("shingle"), col("__s").as("sa"))
    val b = pref.select(col(idCol).as("id_b"), col("shingle"), col("__s").as("sb"))
    val cand = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b") &&
        col("sb") >= ceil(lit(tau) * col("sa")) &&
        col("sa") >= ceil(lit(tau) * col("sb")))
      .select("id_a", "id_b", "sa", "sb").distinct()
    // verify on packed shingle sets: one row per candidate with an
    // array_intersect, instead of re-exploding both sides through a
    // (candidate × shingles) join (which multiplies candidates by the
    // average set size — measured 5.5M intermediate rows vs 105k
    // candidates on this corpus at sf0.1)
    val sets = sh.groupBy(col(idCol)).agg(collect_set(col("shingle")).as("__set"))
      .persist() // consumed by both join sides — one aggregation, not two
    val inter = cand
      .join(sets.select(col(idCol).as("id_a"), col("__set").as("__seta")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("__set").as("__setb")), "id_b")
      .withColumn("__i", size(array_intersect(col("__seta"), col("__setb"))))
    inter
      .filter(col("__i").cast("double") /
        (col("sa") + col("sb") - col("__i")) >= tau)
      .select(col("id_a"), col("id_b"),
        round(lit(10000.0) * col("__i") /
          (col("sa") + col("sb") - col("__i"))).cast("long").as("jac_bp"))
  }
}
