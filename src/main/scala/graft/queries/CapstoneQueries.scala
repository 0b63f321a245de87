package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Curation, Dedup, DetHash, Multimodal, Similarity, TextAnalysis}

/** Capstone compositions: end-to-end training-data pipelines whose
  * stages are independently-oracled operators — the green row proves
  * the stages agree THROUGH each other, not just in isolation. */
object CapstoneQueries {

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------
    // The capstone composition — what a training-data user actually
    // runs: exact dedup -> frozen-classifier quality gate ->
    // temperature-mixed sampling over the SURVIVORS -> seeded
    // deterministic shuffle -> per-batch manifest (docs + tokens).
    // Every stage is an independently-oracled operator (q30, q93,
    // q92, q91, q40); the oracle recomposes their SQL end to end, so
    // the green row proves the stages agree THROUGH each other, not
    // just in isolation.
    // ---------------------------------------------------------------
    Q("q102_training_manifest",
      (s, dir) => {
        val docs = Tables(s, dir, "documents")
        val keepers = Dedup.exactGroups(docs, "doc_id", "text")
          .select(col("keeper").as("doc_id"))
        val deduped = docs.join(keepers, "doc_id")
        val survivors = TextAnalysis.classifyQuality(deduped, "text")
          .filter(col("keep"))
          .select("doc_id", "text", "source")
        val sampled = Curation.temperatureSample(
          survivors, "doc_id", "source", alpha = 0.5, targetN = 300L)
        Curation.deterministicShuffle(sampled, "doc_id", "ep0", 4)
          .groupBy("batch")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
              .as("n_tokens"))
          .orderBy("batch")
      },
      Some {
        val logit = TextQueries.sqlQualityLogit
        s"""
        WITH dd AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        d AS (SELECT doc_id, text, source,
                     string_split_regex(lower(text), '\\s+') AS toks
              FROM documents JOIN dd USING (doc_id)),
        k AS (SELECT doc_id, text, source, toks FROM d WHERE ($logit) > 0),
        c AS (SELECT source, count(*) AS n FROM k GROUP BY 1),
        tt AS (SELECT sum(pow(n, 0.5)) AS tot FROM c),
        w AS (SELECT source,
                     least(1.0, 300.0 * (pow(n, 0.5) / tot) / n) AS frac
              FROM c CROSS JOIN tt),
        samp AS (SELECT k.doc_id, k.toks FROM k JOIN w USING (source)
                 WHERE ${DetHash.sqlHash52("k.doc_id::VARCHAR")} % 1000000
                       < floor(w.frac * 1000000)::BIGINT)
        SELECT (${DetHash.sqlHash52("'ep0:' || doc_id")} % 4)::INT AS batch,
               count(*) AS n_docs,
               sum(len(toks))::BIGINT AS n_tokens
        FROM samp GROUP BY 1 ORDER BY 1"""
      },
      "dedup -> quality gate -> temperature sample -> seeded shuffle, one manifest")
  )
}
