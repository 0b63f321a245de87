package graft

import org.apache.spark.sql.execution.SimpleMode

import graft.queries.Registry

/** Mechanical scale-anti-pattern audit over EVERY registered query's
  * physical plan: a query that works at sf0.01 but plans a cartesian
  * product (or an all-pairs nested-loop join) is a 100 TB outage, not a
  * passing query. Guards the "every discovery stage is an equi-join"
  * claim as the registry grows.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** BroadcastNestedLoopJoin is acceptable ONLY when the build side is
    * bounded by construction (spec tables, single-row aggregates,
    * fixed probe sets) — each entry says why. Entries must stay
    * minimal: the audit fails if a listed query stops planning a BNLJ,
    * so stale justifications get cleaned up. */
  private val bnljAllowed = Map(
    "q18_routing" -> "broadcast theta-join against the fixed routing-spec table",
    "q35_cosine_topk" -> "brute-force baseline: corpus scan x broadcast(20 fixed probes)",
    "q79_quantized_ann" -> "same fixed-probe broadcast shape as q35, on int8-quantized vectors",
    "q42_tfidf" -> "crossJoin(broadcast(n_docs)) — a single-row count",
    "q75_bm25" -> "crossJoin(broadcast(corpus N+avgdl)) — a single-row aggregate",
    "q82_lm_score" -> "crossJoin(broadcast(vocab size)) — a single-row count",
    "q47_ivf_ann" -> "crossJoin(broadcast(packed centroids)) — one row by construction",
    "q48_ivf_refine" -> "same single-row packed-centroid pattern as q47",
    "q72_ivf_index_probe" -> "probe fan-out over broadcast(packed centroids) — one row loaded from the index",
    "q92_temperature_mix" -> "crossJoin(broadcast(sum of source weights)) — a single-row aggregate",
    "q97_pq_adc_topk" -> "packed-codebook single row + fixed-probe broadcast, the q35/q47 shapes",
    "q102_training_manifest" -> "inherits q92's crossJoin(broadcast(sum of source weights)) single-row aggregate",
    "q98_ivf_pq_topk" -> "packed centroids + packed codebooks, both single-row broadcasts; candidates join on cell_id",
    "q104_ivf_pq_index_probe" -> "q98's single-row packed centroid/codebook broadcasts, loaded from the persisted index (nCells / m x ksub rows before packing); candidates join on cell_id",
    "q99_ivf_pq_residual" -> "same single-row centroid/codebook broadcasts as q98, plus residual subtraction map-side",
    "q106_ivf_pq_residual_refined" -> "q99's single-row centroid/codebook broadcasts, centroids Lloyd-refined (localized nCells rows)",
    "q107_pq_trained_topk" -> "q97's packed-codebook single row + fixed-probe broadcast, codebooks Lloyd-refined (localized m x ksub rows)",
    "q108_ivf_pq_residual_index_probe" -> "q104's single-row packed centroid/codebook broadcasts loaded from the persisted residual index; candidates join on cell_id",
    "q110_filtered_ivf_ann" -> "q47's single-row packed-centroid broadcasts; candidates equi-join on (cell_id, label)",
    "q111_ivf_pq_rerank" -> "q98's single-row packed broadcasts for the ADC shortlist; the re-rank joins broadcast(shortlist) by id",
    "q96_semantic_dedup" -> "same single-row packed-centroid assignment as q47; pair stage is a cell equi-join",
    "q138_bpe_second_merge" -> "crossJoin(broadcast(top-1 merge pair)) — a single-row limit(1)")

  test("no registered query plans a CartesianProduct or an unjustified nested-loop join") {
    val plans = Registry.all.map { q =>
      q.name -> q.run(spark, sfDir).queryExecution.explainString(SimpleMode)
    }
    val cartesian = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(cartesian.isEmpty, s"cartesian products in: $cartesian")

    val bnlj = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") => n
    }.toSet
    val unjustified = bnlj -- bnljAllowed.keySet
    assert(unjustified.isEmpty,
      s"BNLJ without a documented tiny-build-side justification: $unjustified")
    val stale = bnljAllowed.keySet -- bnlj
    assert(stale.isEmpty, s"stale BNLJ whitelist entries (plan changed): $stale")
  }
}
