package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exact baseline (probe-set × corpus,
  * pruned by a row_number window). The scale path is random-hyperplane
  * LSH: sign-bit buckets over deterministic pseudo-random planes, so
  * candidate generation is an equi-join on (table, bucket) — never a
  * cross join — with exact cosine only on candidates. Multi-table
  * probing ([[rpTables]]) trades candidate count for recall:
  * P(candidate | cos θ) = 1 - (1 - (1 - θ/π)^nBits)^nTables.
  *
  * All plane projections are built from ONE array-of-arrays literal +
  * `aggregate(zip_with(...))` — a compact plan (the naive unrolled
  * nBits×dim expression tree produced MiB-scale task binaries).
  *
  * All arithmetic is done in DOUBLE after an explicit cast — float
  * accumulation order would otherwise differ between engines and break
  * the oracle hash.
  */
object Similarity {

  /** Cosine similarity between two embedding columns, computed in
    * double by the native codegen'd [[graft.functions.CosineSimilarity]]
    * expression — one fused allocation-free loop per row, no shuffle,
    * no UDF, and the surrounding WholeStageCodegen span stays intact
    * (the composed `aggregate(zip_with(...))` form is CodegenFallback).
    * Exact result parity with the composed form: same double widening,
    * same left-to-right accumulation order. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineSim(a, b)

  /** Brute-force cosine top-k: for each probe row, the k nearest corpus
    * rows (excluding itself). Ranking uses the ROUNDED similarity with
    * the neighbor id as tie-break, so results are reproducible across
    * engines and runs. Broadcast the probe side: the corpus never
    * shuffles. */
  def bruteForceTopK(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("probe_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "sim", "rank")
  }

  /** Attribute-filtered exact top-k — metadata-constrained vector
    * search (the "nearest neighbors with the same language / source /
    * label" query every curation pipeline runs). The constraint is a
    * PRE-filter pushed into candidate generation itself: candidates
    * come from an equi-join ON the filter column (probes broadcast),
    * so a probe only ever scores matching rows. Post-filtering a
    * plain top-k would both waste the non-matching scores and
    * silently return fewer than k survivors. */
  def filteredTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, filterCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("probe_vec"), col(filterCol).as("__f"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("vec"), col(filterCol).as("__f"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(p), "__f")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("probe_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "sim", "rank")
  }

  /** Scalar int8 quantization of the embedding column: per-vector
    * scale = max|x| / 127, components rounded to [-127, 127]. The
    * 4× storage cut (and the integer dot products it enables) is the
    * standard first rung of the ANN memory ladder (IVF-PQ being the
    * next). Cosine needs NO dequantization: the per-vector scales
    * cancel, so similarity on the int arrays equals similarity on the
    * dequantized vectors — and because int8 dots are EXACT in doubles
    * (≤ 127²·dim ≪ 2⁵³), the quantized cosine is bit-deterministic
    * under any accumulation order, which float embeddings are not.
    * All-zero vectors quantize to all zeros (scale 0 guard). */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol),
        (array_max(transform(col(vecCol), x => abs(x.cast("double")))) / 127.0)
          .as("q_scale"),
        col(vecCol))
      .withColumn("qvec",
        when(col("q_scale") === 0.0,
          transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol),
            x => round(x.cast("double") / col("q_scale")).cast("int"))))
      .drop(vecCol)

  /** Brute-force top-k over int8-quantized vectors — [[bruteForceTopK]]
    * with the similarity computed on the quantized arrays (cast to
    * double for the fused cosine expression; values stay exact). */
  def quantizedTopK(corpus: DataFrame, probes: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = quantizeInt8(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("qvec").cast("array<double>").as("vec"))
    val p = quantizeInt8(probes, idCol, vecCol)
      .select(col(idCol).as("probe_id"), col("qvec").cast("array<double>").as("probe_vec"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("qsim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("qsim", round(cosine(col("probe_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "qsim", "rank")
  }

  /** All near-duplicate pairs by cosine threshold, ALL-PAIRS form:
    * O(n²) BroadcastNestedLoopJoin — small data / oracle twin ONLY.
    * The registered scale path is [[nearDupPairsLsh]]. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, minSim: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("sim") >= minSim)
      .select("id_a", "id_b", "sim")
  }

  /** Near-duplicate pairs at scale: banded random-hyperplane LSH
    * candidates (equi-join on (band, bucket)) + exact-cosine verify.
    * Shuffles on the bucket key — the all-pairs product never
    * materializes. Recall vs [[nearDupPairs]] follows the banding
    * formula in the class doc (bands = nTables, rowsPerBand = nBits);
    * pairs missed by every band are absent, so callers pick band shape
    * by target similarity. */
  def nearDupPairsLsh(df: DataFrame, idCol: String, vecCol: String,
      minSim: Double, bands: Int, rowsPerBand: Int, dim: Int): DataFrame = {
    val t = rpTables(df, idCol, vecCol, rowsPerBand, bands, dim)
    val a = t.toDF("id_a", "vec_a", "band", "bucket")
    val b = t.toDF("id_b", "vec_b", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "vec_a", "id_b", "vec_b").distinct()
      .withColumn("sim", round(cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("sim") >= minSim)
      .select("id_a", "id_b", "sim")
  }

  // ------------------------------------------------------------------
  // Product quantization (the rung above int8 on the ANN memory ladder:
  // dim doubles → m one-byte codes, 32× at dim=64/m=8, with
  // asymmetric-distance search that never decodes the corpus).
  // ------------------------------------------------------------------

  /** PQ codebooks: split the dim-`dim` space into `m` contiguous
    * subspaces of dim/m; subspace j's codebook is the j-th subvector of
    * the same deterministic hash-ordered sample that seeds
    * [[ivfCentroids]] (ksub rows, code = sample rank). Sampled
    * codebooks are the standard PQ bootstrap (k-means refinement bolts
    * on exactly like [[ivfRefine]]); determinism is what makes the
    * oracle possible. Output: (subspace, code, centroid<array<double>>),
    * EAGERLY materialized (m×ksub rows collected at call time) so the
    * several downstream consumers — encode, each LUT build, every
    * packCodebooks — never re-run the corpus-wide sample sort. */
  def pqCodebooks(df: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int): DataFrame = {
    require(m > 0 && ksub > 0 && ksub <= 256,
      s"need m > 0 and 0 < ksub <= 256 (one-byte codes), got m=$m ksub=$ksub")
    val sample = df
      .select(col(idCol), transform(col(vecCol), _.cast("double")).as("__v"))
      .orderBy(DetHash.hash52(col(idCol).cast("string")), col(idCol))
      .limit(ksub)
      .withColumn("code",
        row_number().over(Window.orderBy(
          DetHash.hash52(col(idCol).cast("string")), col(idCol))) - 1)
    val dsub = (size(col("__v")) / lit(m)).cast("int")
    // m x ksub rows with corpus-wide lineage (the sample sort): every
    // consumer (encode, each LUT build, packCodebooks) re-runs it
    // unless localized here
    localize(sample.select(col("code"),
        explode(transform(sequence(lit(0), lit(m - 1)), j =>
          struct(j.as("subspace"),
            slice(col("__v"), j * dsub + 1, dsub).as("centroid"))))
          .as("sc"))
      .select(col("sc.subspace").as("subspace"), col("code"),
        col("sc.centroid").as("centroid")))
  }

  /** One Lloyd refinement step over PQ codebooks — the [[ivfRefine]]
    * move applied per subspace: every vector's subvector j is assigned
    * to its current argmin code (the [[pqEncode]] rule), and each
    * (subspace, code) centroid becomes the element-wise mean of its
    * members, components rounded to 6 decimals. Codes that lost all
    * members keep their original centroid so the codebook stays the
    * full m×ksub grid [[pqEncode]]'s consumed guard requires. One
    * map-side corpus pass (broadcast codebooks, explode to dim rows
    * per vector) + one groupBy shuffle — the q48 shape.
    *
    * Motivation is measured, not argued: hash-sampled codebooks bound
    * flat-PQ recall@10 at 0.113 (m=8) on the sf0.1 embeddings; one
    * refinement step lifts it (RecallSweep table in SCALING.md, q107
    * pins the refined path end-to-end).
    *
    * `trainCap` > 0 bounds the TRAINING SET to the first `trainCap`
    * vectors in deterministic hash order (the same ordering that seeds
    * [[pqCodebooks]]) — the FAISS discipline: at corpus scale nobody
    * Lloyd-steps 100 TB; you train on a fixed-size sample and encode
    * everything. 0 = train on the full frame (small-corpus exact
    * mode). The refinement pass then touches `trainCap` rows instead
    * of the corpus, while encode remains a full map-side pass. */
  def pqRefineCodebooks(df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int, ksub: Int, trainCap: Int = 0): DataFrame = {
    require(m > 0 && ksub > 0, s"need m > 0 and ksub > 0, got m=$m ksub=$ksub")
    val train =
      if (trainCap > 0)
        df.orderBy(DetHash.hash52(col(idCol).cast("string")), col(idCol))
          .limit(trainCap)
      else df
    val v = transform(col(vecCol), _.cast("double"))
    val dsub = (size(col("__v")) / lit(m)).cast("int")
    val members = train.crossJoin(broadcast(packCodebooks(codebooks)))
      // materialize codes/doubles once per row: referencing the argmin
      // expression inside the per-subspace transform would re-run the
      // whole m×ksub distance scan m times
      .withColumn("__v", v)
      .withColumn("__codes", pqCodesExpr(col("__v"), m, ksub))
      .select(explode(transform(sequence(lit(0), lit(m - 1)), j =>
        struct(j.as("subspace"),
          element_at(col("__codes"), (j + 1).cast("int")).as("code"),
          slice(col("__v"), j * dsub + 1, dsub).as("sv")))).as("e"))
      .select(col("e.subspace").as("subspace"), col("e.code").as("code"),
        posexplode(col("e.sv")).as(Seq("i", "x")))
    val refined = members
      .groupBy("subspace", "code", "i")
      .agg(round(avg(col("x")), 6).as("x"))
      .groupBy("subspace", "code")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("x")))),
        e => e.getField("x")).as("centroid"))
    localize(codebooks
      .select(col("subspace"), col("code"), col("centroid").as("__c0"))
      .join(refined, Seq("subspace", "code"), "left")
      .select(col("subspace"), col("code"),
        coalesce(col("centroid"), col("__c0")).as("centroid")))
  }

  /** Codebooks packed into one broadcastable row, ordered by
    * (subspace, code) so `element_at(cents, subspace*ksub + code + 1)`
    * is the lookup. */
  private def packCodebooks(codebooks: DataFrame): DataFrame =
    codebooks.agg(transform(
      array_sort(collect_list(struct(
        col("subspace"), col("code"), col("centroid")))),
      e => e.getField("centroid")).as("__cb"))

  /** PQ encoding: each vector → `m` one-byte codes, code j = argmin
    * rounded L2 distance between subvector j and subspace j's
    * codebook (ties → smaller code, via lexicographic struct-min).
    * Map-side only: one tiny broadcast, no shuffle, stays in codegen. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int, ksub: Int): DataFrame = {
    require(m > 0 && ksub > 0, s"need m > 0 and ksub > 0, got m=$m ksub=$ksub")
    df.crossJoin(broadcast(packCodebooks(codebooks)))
      .select(col(idCol),
        pqCodesExpr(transform(col(vecCol), _.cast("double")), m, ksub)
          .as("codes"))
  }

  /** The guarded code-assignment expression of [[pqEncode]], for plans
    * that fuse encoding with other per-row derivations (the IVF-PQ
    * list builders compute cell_id and codes in ONE corpus pass instead
    * of two passes joined on id). Requires the packed `__cb` column in
    * scope. The guard lives INSIDE the consumed expression (cannot be
    * pruned): a dim not divisible by m would silently drop the last
    * dim % m components from every code, and a sampled codebook shorter
    * than m×ksub (corpus < ksub) would make out-of-range element_at
    * NULLs win every argmin — both are data-shape bugs to fail loudly
    * on. */
  private def pqCodesExpr(vecDoubles: Column, m: Int, ksub: Int): Column = {
    val v = vecDoubles
    // NATIVE encode (graft.functions.PqEncodeExpr): the composed
    // transform/zip_with/aggregate argmin was CodegenFallback — every
    // corpus row paid m×ksub×dsub interpreted lambda dispatches plus a
    // struct allocation per candidate code. One JVM loop now; values
    // bit-identical (rounding, NaN/null ordering, tie-to-smaller-code
    // — QuantizeSpec + the PQ oracle rows pin it). The shape guard
    // stays INSIDE the consumed expression, exactly as before.
    val codes = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.PqEncodeExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(v),
        org.apache.spark.sql.GraftColumnBridge.expression(col("__cb")),
        m, ksub))
    when(size(v) % m === 0 && size(col("__cb")) === m * ksub, codes)
      .otherwise(raise_error(format_string(
        s"pqEncode: need dim %% $m == 0 and a full codebook of ${m * ksub} " +
          s"entries; got dim=%s, codebook=%s (is ksub > corpus size?)",
        size(v), size(col("__cb")))))
  }

  /** Collect a BOUNDED frame into a local relation so its (possibly
    * corpus-wide) lineage executes exactly once — every consumer of a
    * lazy bounded frame would otherwise re-run the derivation (the
    * double-execution pitfall ivfTopK documents). Only call on frames
    * bounded by construction: centroid tables (nCells rows), PQ
    * codebooks (m x ksub rows), per-source counts. The collect is
    * EAGER: the caller's API becomes snapshot-at-composition (document
    * it there). */
  private[ext] def localize(d: DataFrame): DataFrame =
    d.sparkSession.createDataFrame(
      java.util.Arrays.asList(d.collect(): _*), d.schema)

  /** Plain (unrounded) dot product of two double-array columns, fixed
    * left-to-right accumulation. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, d) => acc + d)

  /** The probe's m×ksub ADC lookup table over the packed codebooks
    * column `__cb`: entry (j·ksub + c) = rounded dot of probe
    * subvector j with codebook entry (j, c). */
  private def pqLut(pv: Column, m: Int, ksub: Int): Column =
    // native twin of the composed rounded-dot table (see pqCodesExpr)
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.PqLutExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(pv),
        org.apache.spark.sql.GraftColumnBridge.expression(col("__cb")),
        m, ksub))

  /** Sum of the `__lut` entries selected by the row's `codes` —
    * native (one JVM loop per candidate row; the aggregate fold was
    * interpreted per row on every probed candidate). */
  private def pqAdc(m: Int, ksub: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.PqAdcExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(col("__lut")),
        org.apache.spark.sql.GraftColumnBridge.expression(col("codes")),
        m, ksub))

  /** Asymmetric-distance (ADC) top-k: the probe builds an m×ksub
    * lookup table of rounded partial dots against every codebook
    * centroid; each corpus row's score is then m table lookups summed —
    * the corpus is never decoded, never recomputed, and the scan stays
    * map-side (probes broadcast, row_number top-k per probe exactly
    * like [[bruteForceTopK]]). Scores approximate the probe·corpus dot
    * (inner-product PQ); rank fidelity vs exact cosine is what
    * QuantizeSpec pins on planted duplicates. */
  def pqTopK(codes: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, codebooks: DataFrame, m: Int, ksub: Int,
      k: Int): DataFrame = {
    val pv = transform(col(vecCol), _.cast("double"))
    val p = probes
      .crossJoin(broadcast(packCodebooks(codebooks)))
      .select(col(idCol).as("probe_id"), pqLut(pv, m, ksub).as("__lut"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    codes.select(col(idCol).as("neighbor_id"), col("codes"))
      .crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("score", round(pqAdc(m, ksub), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "score", "rank")
  }

  /** Candidate-scoring tail shared by every IVF-PQ probe (inline and
    * persisted, direct and residual): cell equi-join onto the
    * compressed lists — candidates = probed cells only — then the ADC
    * score and per-probe row_number top-k. `score` differs by
    * encoding: direct sums the LUT; residual adds the exact
    * probe·centroid term. One definition so the inline and persisted
    * paths cannot drift apart silently. */
  private def adcRank(probed: DataFrame, lists: DataFrame,
      score: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    probed.join(lists, Seq("cell_id"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "score", "rank")
  }

  /** IVF-PQ (no residual): the production 100 TB ANN layout — vectors
    * live in IVF cell-partitioned inverted lists as `m`-byte PQ codes;
    * a probe fans out to its `nProbe` nearest cells and ADC-scores ONLY
    * those cells' codes (cell equi-join on the compressed lists; the
    * corpus is never decoded and only candidate rows are touched).
    * This variant encodes v directly (global codebooks, simplest
    * composition); [[ivfPqResidualTopK]] is the classical residual
    * encoding. Returns (probe_id, neighbor_id, score, rank). */
  def ivfPqTopK(df: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, nCells: Int, nProbe: Int, m: Int, ksub: Int,
      k: Int): DataFrame = {
    // both bounded frames localized: cents' sample sort and cb's are
    // corpus lineage that every pack/probe consumer would re-run
    val cents = localize(ivfCentroids(df, idCol, vecCol, nCells))
    val cb = pqCodebooks(df, idCol, vecCol, m, ksub) // localized inside
    // ONE corpus pass builds the compressed lists: both the centroid
    // pack and the codebook pack are single-row broadcasts, so cell_id
    // and codes are sibling map-side expressions — an assign⋈encode
    // join on id would scan the corpus twice and shuffle it once for
    // nothing
    val lists = df
      .crossJoin(broadcast(packCentroids(cents)))
      .crossJoin(broadcast(packCodebooks(cb)))
      .select(col(idCol).as("neighbor_id"),
        (-array_max(cellScores(col(vecCol))).getField("neg_id")).as("cell_id"),
        pqCodesExpr(transform(col(vecCol), _.cast("double")), m, ksub)
          .as("codes"))
    val pv = transform(col(vecCol), _.cast("double"))
    val probed = ivfProbeCells(probes, idCol, vecCol, cents, nProbe)
      .crossJoin(broadcast(packCodebooks(cb)))
      .select(col(idCol).as("probe_id"), col("cell_id"),
        pqLut(pv, m, ksub).as("__lut"))
    adcRank(probed, lists, round(pqAdc(m, ksub), 4), k)
  }

  /** (id, cell_id, __res = v − centroid(cell(v))) — the residual frame
    * both the inline residual plan and the persisted-index build
    * encode from. Assignment is the map-side centroid broadcast;
    * the subtraction is a sibling zip_with — no extra corpus pass. */
  private def residualFrame(df: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame): DataFrame =
    ivfAssign(df, idCol, vecCol, cents)
      .join(broadcast(cents), "cell_id")
      .select(col(idCol), col("cell_id"),
        zip_with(transform(col(vecCol), _.cast("double")), col("centroid"),
          (x, y) => x - y).as("__res"))

  /** Probe-side frame for residual ADC, shared by the inline and
    * persisted residual probes: the nProbe cell fan-out carrying the
    * exact probe·centroid term (`__cdot`) and the residual-codebook
    * LUT. */
  private def residualProbe(probes: DataFrame, idCol: String,
      vecCol: String, cents: DataFrame, cb: DataFrame, nProbe: Int,
      m: Int, ksub: Int): DataFrame = {
    val pv = transform(col(vecCol), _.cast("double"))
    ivfProbeCells(probes, idCol, vecCol, cents, nProbe)
      .join(broadcast(cents), "cell_id")
      .crossJoin(broadcast(packCodebooks(cb)))
      .select(col(idCol).as("probe_id"), col("cell_id"),
        round(dot(pv, col("centroid")), 4).as("__cdot"),
        pqLut(pv, m, ksub).as("__lut"))
  }

  /** Residual IVF-PQ — the classical FAISS encoding: each vector's PQ
    * codes quantize the RESIDUAL `v − centroid(cell(v))` (residuals
    * concentrate near the origin, so the same codebook budget buys a
    * tighter quantization than coding raw vectors), with codebooks
    * sampled from the residuals themselves. A probe's score against a
    * candidate recovers dot(p, v) ≈ dot(p, c_cell) + dot(p, r̂):
    * the centroid term is exact (one tiny lookup per probed cell), the
    * residual term is the same ADC LUT as [[pqTopK]] built over the
    * residual codebooks. Same plan shape as [[ivfPqTopK]]: everything
    * map-side except the candidate cell equi-join.
    *
    * `centroids` defaults to the deterministic seed sample — but note
    * that residual coding's premise (residuals concentrate near the
    * origin) FAILS for sampled corpus-point centroids on normalized
    * embeddings: mean residual norm is sqrt(2 − 2·cos(v, c)) ≈ 1.24 on
    * the unit-norm test embeddings, i.e. residuals are LARGER than the
    * vectors, and measured recall@10 drops to 0.024 vs direct IVF-PQ's
    * 0.122 (RecallSweep, sf0.1). Pass [[ivfRefine]] output (cell
    * means, mean residual norm ≈ 0.97) to restore the classical
    * ordering — refined-residual measures 0.138, beating direct.
    * SCALING.md carries the full sweep. */
  def ivfPqResidualTopK(df: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, nCells: Int, nProbe: Int, m: Int, ksub: Int,
      k: Int, centroids: Option[DataFrame] = None): DataFrame = {
    val cents = localize(
      centroids.getOrElse(ivfCentroids(df, idCol, vecCol, nCells)))
    val resid = residualFrame(df, idCol, vecCol, cents)
    val cb = pqCodebooks(resid, idCol, "__res", m, ksub)
    // one pass over the residual frame: cell_id rides along, codes are
    // a sibling expression over the packed codebooks (no id-shuffle
    // join with a second derivation of the residuals)
    val lists = resid
      .crossJoin(broadcast(packCodebooks(cb)))
      .select(col(idCol).as("neighbor_id"), col("cell_id"),
        pqCodesExpr(col("__res"), m, ksub).as("codes"))
    val probed = residualProbe(probes, idCol, vecCol, cents, cb,
      nProbe, m, ksub)
    adcRank(probed, lists, round(col("__cdot") + pqAdc(m, ksub), 4), k)
  }

  /** SemDeDup-style semantic dedup: IVF-assign every vector to its
    * nearest centroid (map-side broadcast, corpus never shuffles for
    * the assignment), compute exact cosine on WITHIN-CELL pairs only —
    * the SemDeDup observation that semantic duplicates land in the
    * same cluster, so the cell bounds the pair fan-out — and drop
    * every vector with a more-senior near-duplicate (same-cell
    * neighbor, `sim >= minSim`, smaller id). Pairwise keeper rule, not
    * transitive closure: a chain a~b~c with a<b<c drops b AND c even
    * when sim(a,c) < minSim — deliberately aggressive on chains;
    * compose [[graft.ext.Dedup]]'s connected components over the pair
    * set when exact cluster semantics matter. Cross-cell near-dups are
    * missed by construction — the recall/cost trade `nCells` tunes.
    * Returns survivors as (id, cell_id). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int, minSim: Double): DataFrame = {
    val assigned = ivfAssign(df, idCol, vecCol,
      localize(ivfCentroids(df, idCol, vecCol, nCells)))
    val a = assigned.select(col("cell_id"),
      col(idCol).as("__id_a"), col(vecCol).as("__v_a"))
    val b = assigned.select(col("cell_id"),
      col(idCol).as("__id_b"), col(vecCol).as("__v_b"))
    val dropped = a.join(b, Seq("cell_id"))
      .filter(col("__id_a") < col("__id_b"))
      .filter(round(cosine(col("__v_a"), col("__v_b")), 4) >= minSim)
      .select(col("__id_b").as(idCol)).distinct()
    assigned.join(dropped, Seq(idCol), "left_anti")
      .select(col(idCol), col("cell_id"))
  }

  /** Plane weight matrix W(bit)(d), derived from [[hash52Const]] of
    * "rp-<bit>-<d>" mapped to [-1000, 1000] — reproducible in SQL, no
    * RNG state. */
  private def planeWeights(nBits: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nBits).map(bit => (0 until dim).map(d =>
      ((hash52Const(s"rp-$bit-$d") % 2001L) - 1000L).toDouble))

  /** Driver-side constant twin of [[DetHash.hash52]] (same md5-prefix
    * semantics) for baking plane weights into the plan as literals. */
  def hash52Const(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  /** Sign-bit array (0/1 longs) for `nBits` hyperplanes. One W literal;
    * per-bit projection = `aggregate(zip_with(vec, W[b], *), +)`. */
  def rpBits(vec: Column, nBits: Int, dim: Int): Column = {
    val w = typedlit(planeWeights(nBits, dim))
    transform(sequence(lit(0), lit(nBits - 1)), b => {
      val proj = aggregate(
        zip_with(vec, element_at(w, b + 1), (x, wt) => x.cast("double") * wt),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, 1L).otherwise(0L)
    })
  }

  /** Bucket key from a bit array: big-endian fold, bucket = Σ bitᵢ ≪
    * (n-1-i). SQL twin: `sum(bit << (n-1-i))`. */
  private def bucketKey(bits: Column): Column =
    aggregate(bits, lit(0L), (acc, bit) => acc * 2 + bit)

  /** Single-table bucket over nBits sign bits. */
  def rpBucket(vec: Column, nBits: Int, dim: Int): Column =
    bucketKey(rpBits(vec, nBits, dim))

  /** Multi-table LSH in long format: `nTables` tables × `nBits` bits
    * each; table t owns global bits [t·nBits, (t+1)·nBits). Output one
    * row per (id, table) with the table-local bucket key, so candidate
    * generation is a plain equi-join on (table, bucket). The bit array
    * is computed once per input row (explode happens after). */
  def rpTables(df: DataFrame, idCol: String, vecCol: String,
      nBits: Int, nTables: Int, dim: Int): DataFrame = {
    val withBits = df.select(col(idCol), col(vecCol),
      rpBits(col(vecCol), nBits * nTables, dim).as("bits"))
    val tb = (0 until nTables).map { t =>
      struct(lit(t).as("table_id"),
        bucketKey(slice(col("bits"), t * nBits + 1, nBits)).as("bucket"))
    }
    withBits.select(col(idCol), col(vecCol), explode(array(tb: _*)).as("tb"))
      .select(col(idCol), col(vecCol),
        col("tb.table_id").as("table_id"), col("tb.bucket").as("bucket"))
  }

  /** ANN via multi-table random-hyperplane LSH: candidates share any
    * table's bucket; exact cosine + top-k on candidates only. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      nBits: Int, dim: Int, probeFilter: Column, nTables: Int = 2): DataFrame = {
    val t = rpTables(df, idCol, vecCol, nBits, nTables, dim)
    val a = t.filter(probeFilter).toDF("probe_id", "probe_vec", "table_id", "bucket")
    val b = t.toDF("neighbor_id", "vec", "table_id", "bucket")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    a.join(b, Seq("table_id", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "probe_vec", "neighbor_id", "vec").distinct()
      .withColumn("sim", round(cosine(col("probe_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "sim", "rank")
  }

  // ---------------------------------------------------------------
  // IVF-Flat: coarse quantizer + inverted cell lists.
  //
  // The centroid set is tiny by construction (nCells rows), so it is
  // packed into ONE row and broadcast: assignment and probe fan-out are
  // map-side array scans inside codegen — zero shuffle over the corpus.
  // Candidate generation is then a plain equi-join on cell_id (each
  // corpus row lives in exactly one cell, so candidates are already
  // distinct). The only corpus-sized shuffle in the whole pipeline is
  // that one join — the shape that survives 100 TB.
  // ---------------------------------------------------------------

  /** Deterministic coarse quantizer "training": the `nCells` vectors
    * with the smallest md5-derived key (ties by id) form the centroid
    * set — a reproducible uniform sample with no RNG state, so the
    * DuckDB oracle selects the identical rows. Cell id = the centroid's
    * own vector id. Refine with [[ivfRefine]] if wanted. */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String, nCells: Int): DataFrame =
    df.select(col(idCol).as("cell_id"),
        transform(col(vecCol), _.cast("double")).as("centroid"))
      .orderBy(DetHash.hash52(col("cell_id").cast("string")), col("cell_id"))
      .limit(nCells)

  /** Rounded cosine of `vec` against every packed centroid, as
    * array<struct<sim, neg_id>>. neg_id = -cell_id so that struct-max /
    * descending sort break sim ties toward the SMALLEST cell id —
    * matching `ORDER BY sim DESC, cell_id` on the oracle side. */
  private def cellScores(vec: Column): Column =
    transform(col("cents"), c =>
      struct(round(cosine(vec, c.getField("centroid")), 4).as("sim"),
        (-c.getField("cell_id")).as("neg_id")))

  /** Centroids packed into a single broadcastable row `cents`. */
  private def packCentroids(centroids: DataFrame): DataFrame =
    centroids.agg(collect_list(struct(col("cell_id"), col("centroid"))).as("cents"))

  /** IVF assignment: each row → its nearest cell (argmax rounded
    * cosine). Map-side only: one tiny broadcast, the per-row cell loop
    * runs inside codegen, the corpus never shuffles. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    assignPacked(df, idCol, vecCol, packCentroids(centroids))

  private def assignPacked(df: DataFrame, idCol: String, vecCol: String,
      packed: DataFrame, extra: Seq[String] = Nil): DataFrame =
    df.select(col(idCol) +: col(vecCol) +: extra.map(col): _*)
      .crossJoin(broadcast(packed))
      .withColumn("best", array_max(cellScores(col(vecCol))))
      .select((col(idCol) +: col(vecCol) +: extra.map(col)) :+
        (-col("best.neg_id")).as("cell_id"): _*)

  /** Probe fan-out: each probe row → its `nProbe` nearest cells (one
    * output row per (probe, cell)). Same map-side shape as assignment. */
  def ivfProbeCells(probes: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, nProbe: Int): DataFrame =
    probePacked(probes, idCol, vecCol, packCentroids(centroids), nProbe)

  private def probePacked(probes: DataFrame, idCol: String, vecCol: String,
      packed: DataFrame, nProbe: Int, extra: Seq[String] = Nil): DataFrame =
    probes.select(col(idCol) +: col(vecCol) +: extra.map(col): _*)
      .crossJoin(broadcast(packed))
      .withColumn("cell",
        explode(slice(reverse(array_sort(cellScores(col(vecCol)))), 1, nProbe)))
      .select((col(idCol) +: col(vecCol) +: extra.map(col)) :+
        (-col("cell.neg_id")).as("cell_id"): _*)

  /** One Lloyd refinement step: new centroid = element-wise mean of the
    * vectors assigned to the cell, components rounded to 6 decimals so
    * double accumulation-order noise can't leak into downstream rounded
    * cosines. Cells that lost all members disappear (standard k-means).
    * posexplode → avg per (cell, component) → reassemble in order. */
  def ivfRefine(assigned: DataFrame, vecCol: String): DataFrame =
    assigned
      .select(col("cell_id"), posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("cell_id", "i")
      .agg(round(avg(col("x").cast("double")), 6).as("x"))
      .groupBy("cell_id")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("x")))),
        e => e.getField("x")).as("centroid"))

  /** IVF-Flat ANN top-k: probe fan-out ⋈ inverted cell lists on
    * cell_id, exact rounded cosine + windowed top-k on candidates only.
    * `centroids` defaults to the deterministic seed sample; pass
    * [[ivfRefine]] output for trained cells. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      nCells: Int, nProbe: Int, probeFilter: Column,
      centroids: Option[DataFrame] = None): DataFrame = {
    val cents = centroids.getOrElse(ivfCentroids(df, idCol, vecCol, nCells))
    // Materialize the packed centroids EAGERLY as a local relation: the
    // selection is a corpus-wide TakeOrdered, and the two broadcast
    // consumers (assign + probe) don't canonicalize to a reusable
    // exchange — without this the full-corpus pass would execute twice.
    // One row, nCells structs: driver-side by construction.
    val packed = {
      val p = packCentroids(cents)
      p.sparkSession.createDataFrame(
        java.util.Arrays.asList(p.collect(): _*), p.schema)
    }
    val inv = assignPacked(df, idCol, vecCol, packed)
      .toDF("neighbor_id", "vec", "cell_id")
    val probes = probePacked(df.filter(probeFilter), idCol, vecCol, packed, nProbe)
      .toDF("probe_id", "probe_vec", "cell_id")
    rankCandidates(probes, inv, k)
  }

  /** Shared IVF tail: probe fan-out ⋈ inverted lists on `keys`
    * (cell_id, plus any filter columns pushed into the join), exact
    * rounded cosine, windowed top-k on candidates only. */
  private def rankCandidates(probes: DataFrame, inv: DataFrame, k: Int,
      keys: Seq[String] = Seq("cell_id")): DataFrame = {
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    probes.join(inv, keys)
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("probe_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "sim", "rank")
  }

  /** Attribute-filtered IVF top-k: [[ivfTopK]] with the metadata
    * constraint pushed INTO the candidate equi-join — candidates must
    * match on (cell_id, filterCol), so non-matching rows are never
    * cosine-scored and never leave their scan. At 100 TB this is the
    * difference between "score the probed cells, then discard 90%"
    * and "touch only the matching slice of each probed cell"; with
    * the inverted lists additionally bucketed by the filter column
    * the join stays exchange-free on the list side. Filtering shrinks
    * each probe's candidate pool, not the cell fan-out — recall per
    * nProbe matches unfiltered IVF over the matching subset. */
  def filteredIvfTopK(df: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, filterCol: String, nCells: Int, nProbe: Int,
      k: Int): DataFrame = {
    val packed = localize(packCentroids(
      localize(ivfCentroids(df, idCol, vecCol, nCells))))
    val inv = assignPacked(df, idCol, vecCol, packed, Seq(filterCol))
      .toDF("neighbor_id", "vec", "__f", "cell_id")
    val fan = probePacked(probes, idCol, vecCol, packed, nProbe, Seq(filterCol))
      .toDF("probe_id", "probe_vec", "__f", "cell_id")
    rankCandidates(fan, inv, k, Seq("cell_id", "__f"))
  }

  /** Two-stage IVF-PQ search — the production recall recipe: a cheap
    * ADC shortlist of `shortlist` candidates per probe from the
    * compressed lists (exactly [[ivfPqTopK]]), then EXACT cosine
    * re-ranking of only those rows, joined back to the raw corpus by
    * id. The refine tier reads |probes|×shortlist raw vectors — the
    * shortlist (with probe vectors attached) broadcasts, the corpus
    * never shuffles — so the exact-distance work no longer scales
    * with cell size, only with the shortlist. Recall approaches
    * IVF-Flat at the same nProbe (the probed-cell ceiling) while the
    * corpus-wide scan stays m bytes/vector; RecallSweep measures the
    * curve. */
  def ivfPqRerankTopK(df: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, nCells: Int, nProbe: Int, m: Int, ksub: Int,
      shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k,
      s"shortlist must be >= k, got shortlist=$shortlist k=$k")
    val short = ivfPqTopK(df, probes, idCol, vecCol, nCells, nProbe,
        m, ksub, shortlist)
      .select("probe_id", "neighbor_id")
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("probe_vec"))
    val c = df.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(short.join(broadcast(p), Seq("probe_id"))),
        Seq("neighbor_id"))
      .withColumn("sim", round(cosine(col("probe_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "sim", "rank")
  }

  // ---------------------------------------------------------------
  // Persisted IVF index: build once, probe many — the production ANN
  // lifecycle. The index is two parquet tables under `dir`:
  //   centroids/  one row per cell (cell_id, centroid)
  //   cells/      the inverted lists, HIVE-PARTITIONED by cell_id
  // Partitioning by cell is the point: a probe touches only its
  // nProbe cell directories, so the steady-state probe path scans
  // ~nProbe/nCells of the corpus instead of re-assigning all of it
  // per query batch.
  // ---------------------------------------------------------------

  /** Build and persist the index: deterministic seed centroids
    * (optionally Lloyd-refined `refineSteps` times), one corpus assign
    * pass, inverted lists clustered ONE file per cell (the small-files
    * lesson — an unclustered partitionBy writes every shuffle
    * partition into every cell directory). */
  def writeIvfIndex(df: DataFrame, idCol: String, vecCol: String,
      dir: String, nCells: Int, refineSteps: Int = 0): Unit = {
    // Localize each corpus-wide derivation the moment it is bounded
    // (nCells rows): the build then runs exactly one corpus pass per
    // refine step plus one for the assign.
    var cents = localize(ivfCentroids(df, idCol, vecCol, nCells))
    (0 until refineSteps).foreach { _ =>
      cents = localize(ivfRefine(
        assignPacked(df, idCol, vecCol, packCentroids(cents)), vecCol))
    }
    val assigned = assignPacked(df, idCol, vecCol, packCentroids(cents))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"), col("cell_id"))
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    assigned.repartition(col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id").parquet(s"$dir/cells")
  }

  /** ANN top-k for `probes` against a persisted index — no corpus
    * re-assignment: centroids load (tiny), probe fan-out is map-side,
    * and the cells scan is pruned to the probed cell partitions. */
  /** Append a new vector batch to a persisted index WITHOUT rebuilding:
    * assign against the PERSISTED centroids and append into the cell
    * partitions (existing cell files untouched; probes see old + new
    * immediately). This is the standard IVF maintenance trade — cell
    * balance and recall degrade as the data distribution drifts from
    * the centroids' training set, so rebuild (or [[ivfRefine]]) when
    * drift accumulates; appending never changes what EXISTING vectors
    * a probe can reach. */
  def appendToIvfIndex(spark: SparkSession, dir: String, newVecs: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val cents = spark.read.parquet(s"$dir/centroids")
    assignPacked(newVecs, idCol, vecCol, packCentroids(cents))
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"), col("cell_id"))
      .repartition(col("cell_id"))
      .write.mode("append").partitionBy("cell_id").parquet(s"$dir/cells")
  }

  def ivfTopKFromIndex(spark: SparkSession, dir: String, probes: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int): DataFrame = {
    val cents = spark.read.parquet(s"$dir/centroids")
    val fan = probePacked(probes, idCol, vecCol, packCentroids(cents), nProbe)
      .toDF("probe_id", "probe_vec", "cell_id")
    rankCandidates(fan, readIndexCells(spark, dir), k)
  }

  /** All inverted-list rows of a persisted index: the base `cells`
    * tree plus, when present, the `cells_inc` increments that
    * [[graft.streaming.StreamingIvfIngest]] lands per micro-batch (a
    * separate tree because its extra `batch_id` partition level would
    * conflict with the base layout's partition discovery). */
  def readIndexCells(spark: SparkSession, dir: String): DataFrame = {
    // partition-column inference narrows cell_id to int when the ids
    // fit — pin it back to the long the rest of the pipeline carries
    def load(p: String) = spark.read.parquet(p)
      .select(col("neighbor_id"), col("vec"),
        col("cell_id").cast("long").as("cell_id"))
    val base = load(s"$dir/cells")
    // Hadoop FS, not java.nio: the index dir may be s3a://-style
    val inc = new org.apache.hadoop.fs.Path(s"$dir/cells_inc")
    val fs = inc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(inc)) base.unionByName(load(s"$dir/cells_inc"))
    else base
  }

  /** Build and persist an IVF-PQ index — the steady-state layout a
    * 100 TB vector corpus actually serves from: the inverted lists
    * store `m`-byte PQ CODES, never raw vectors (that compression is
    * IVF-PQ's point; the flat-vector [[writeIvfIndex]] layout is the
    * exact-refine tier). Under `dir`:
    *   centroids/  (cell_id, centroid)            — nCells rows
    *   codebooks/  (subspace, code, centroid)     — m×ksub rows
    *   meta/       (n_cells, m, ksub)             — one row, probe guard
    *   cells_pq/   (neighbor_id, codes, cell_id)  — hive-partitioned by
    *               cell, one file per cell (same clustered write as
    *               [[writeIvfIndex]])
    * The build fuses assignment and encoding into ONE corpus pass —
    * both packs are single-row broadcasts, exactly [[ivfPqTopK]]'s
    * inline list build. */
  def writeIvfPqIndex(df: DataFrame, idCol: String, vecCol: String,
      dir: String, nCells: Int, m: Int, ksub: Int): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = localize(ivfCentroids(df, idCol, vecCol, nCells))
    val cb = pqCodebooks(df, idCol, vecCol, m, ksub) // localized inside
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    cb.write.mode("overwrite").parquet(s"$dir/codebooks")
    Seq((nCells, m, ksub, "direct")).toDF("n_cells", "m", "ksub", "encoding")
      .write.mode("overwrite").parquet(s"$dir/meta")
    df.crossJoin(broadcast(packCentroids(cents)))
      .crossJoin(broadcast(packCodebooks(cb)))
      .select(col(idCol).as("neighbor_id"),
        (-array_max(cellScores(col(vecCol))).getField("neg_id")).as("cell_id"),
        pqCodesExpr(transform(col(vecCol), _.cast("double")), m, ksub)
          .as("codes"))
      .repartition(col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id").parquet(s"$dir/cells_pq")
  }

  /** ADC top-k against a persisted IVF-PQ index: centroids and
    * codebooks load (tiny), the probe fan-out and LUT build are
    * map-side, and the candidate scan reads only the probed cells'
    * CODE partitions — raw vectors are never touched (the index
    * doesn't even store them). Matches [[ivfPqTopK]] inline results
    * exactly over the same corpus (q104 == q98, the q72/q47
    * persisted-vs-inline pattern). Fails loudly if (m, ksub) disagree
    * with the build-time meta — a mismatch would otherwise mis-slice
    * the packed codebook into silently-wrong LUTs. */
  def ivfPqTopKFromIndex(spark: SparkSession, dir: String,
      probes: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int, m: Int, ksub: Int): DataFrame = {
    requireIndexShape(spark, dir, m, ksub, "direct")
    val cents = spark.read.parquet(s"$dir/centroids")
    val cb = spark.read.parquet(s"$dir/codebooks")
    val pv = transform(col(vecCol), _.cast("double"))
    val probed = ivfProbeCells(probes, idCol, vecCol, cents, nProbe)
      .crossJoin(broadcast(packCodebooks(cb)))
      .select(col(idCol).as("probe_id"), col("cell_id"),
        pqLut(pv, m, ksub).as("__lut"))
    adcRank(probed, pqCellLists(spark, dir), round(pqAdc(m, ksub), 4), k)
  }

  /** The compressed inverted lists of a persisted PQ index.
    * Partition-column inference narrows cell_id to int when the ids
    * fit — pin it back to the long the rest of the pipeline carries. */
  private def pqCellLists(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/cells_pq")
      .select(col("neighbor_id"), col("codes"),
        col("cell_id").cast("long").as("cell_id"))

  /** Meta guard shared by the persisted-index probes: (m, ksub) must
    * match the build — a mismatch would mis-slice the packed codebook
    * into silently-wrong LUTs — and the ENCODING must match the
    * prober, because direct and residual codes are byte-compatible but
    * semantically disjoint (a direct probe over residual codes scores
    * dot(p, r̂) as if it were dot(p, v̂) — plausible numbers, wrong
    * ranking). Indexes written before the encoding column existed are
    * read as "direct". */
  private def requireIndexShape(spark: SparkSession, dir: String,
      m: Int, ksub: Int, encoding: String): Unit = {
    val metaDf = spark.read.parquet(s"$dir/meta")
    // one head() — a second job on the one-row meta just to read a
    // second column would double the per-probe driver round-trips
    val meta = metaDf.head()
    val (bm, bk) = (meta.getInt(meta.fieldIndex("m")),
      meta.getInt(meta.fieldIndex("ksub")))
    require(bm == m && bk == ksub,
      s"index at $dir was built with m=$bm ksub=$bk; " +
        s"probe asked for m=$m ksub=$ksub")
    val enc = if (metaDf.columns.contains("encoding"))
      meta.getString(meta.fieldIndex("encoding")) else "direct"
    require(enc == encoding,
      s"index at $dir holds $enc-encoded codes; this probe scores $encoding codes")
  }

  /** The [[writeIvfPqIndex]] lifecycle for RESIDUAL coding over
    * caller-supplied (typically [[ivfRefine]]d) centroids — the
    * classical FAISS production layout: cells_pq partitions hold
    * m-byte codes of `v − centroid(cell(v))`, codebooks are sampled
    * from the residuals, raw vectors are never stored. Pass refined
    * centroids: sampled corpus-point centroids invert residual
    * coding's premise (see [[ivfPqResidualTopK]]). */
  def writeIvfPqResidualIndex(df: DataFrame, idCol: String, vecCol: String,
      dir: String, nCells: Int, m: Int, ksub: Int,
      centroids: Option[DataFrame] = None): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = localize(
      centroids.getOrElse(ivfCentroids(df, idCol, vecCol, nCells)))
    val resid = residualFrame(df, idCol, vecCol, cents)
    val rcb = pqCodebooks(resid, idCol, "__res", m, ksub)
    cents.write.mode("overwrite").parquet(s"$dir/centroids")
    rcb.write.mode("overwrite").parquet(s"$dir/codebooks")
    Seq((nCells, m, ksub, "residual")).toDF("n_cells", "m", "ksub", "encoding")
      .write.mode("overwrite").parquet(s"$dir/meta")
    resid.crossJoin(broadcast(packCodebooks(rcb)))
      .select(col(idCol).as("neighbor_id"), col("cell_id"),
        pqCodesExpr(col("__res"), m, ksub).as("codes"))
      .repartition(col("cell_id"))
      .write.mode("overwrite").partitionBy("cell_id").parquet(s"$dir/cells_pq")
  }

  /** Residual ADC top-k against a [[writeIvfPqResidualIndex]] index:
    * same probe shape as [[ivfPqTopKFromIndex]] plus the exact
    * probe·centroid term per probed cell ([[ivfPqResidualTopK]]'s
    * decomposition). Matches the inline refined-residual plan exactly
    * over the same corpus (q108 == q106, the q72/q104 pattern). */
  def ivfPqResidualTopKFromIndex(spark: SparkSession, dir: String,
      probes: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int, m: Int, ksub: Int): DataFrame = {
    requireIndexShape(spark, dir, m, ksub, "residual")
    val cents = spark.read.parquet(s"$dir/centroids")
    val rcb = spark.read.parquet(s"$dir/codebooks")
    val probed = residualProbe(probes, idCol, vecCol, cents, rcb,
      nProbe, m, ksub)
    adcRank(probed, pqCellLists(spark, dir),
      round(col("__cdot") + pqAdc(m, ksub), 4), k)
  }

  /** [[graft.streaming.StreamingIvfIngest]]'s per-batch body: assign
    * `newVecs` against the PERSISTED centroids and land them under
    * `cells_inc/batch_id=N/cell_id=C` with dynamic partition overwrite —
    * a REPLAYED micro-batch rewrites its own increment partitions
    * instead of double-appending (the [[appendToIvfIndex]] `append`
    * mode is correct for one-shot batch use but not retry-idempotent). */
  def appendIndexIncrement(spark: SparkSession, dir: String,
      newVecs: DataFrame, idCol: String, vecCol: String,
      batchId: Long): Unit = {
    // own the overwrite mode: under the default STATIC mode this write
    // would truncate every earlier batch's increment partitions instead
    // of replacing only batch_id=N (same set-and-restore discipline as
    // MergeData.writeMerged)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val cents = spark.read.parquet(s"$dir/centroids")
      assignPacked(newVecs, idCol, vecCol, packCentroids(cents))
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"),
          col("cell_id"))
        .withColumn("batch_id", lit(batchId))
        .repartition(col("cell_id"))
        .write.mode("overwrite")
        .partitionBy("batch_id", "cell_id")
        .parquet(s"$dir/cells_inc")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
