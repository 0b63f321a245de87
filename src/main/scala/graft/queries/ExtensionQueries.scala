package graft.queries

/** North-star extension operators (SURVEY.md §7.5) as oracle-checked
  * queries, split by domain (round-6 refactor — the single registry
  * had grown past 1,700 lines):
  *
  *  - [[DedupQueries]] — exact / MinHash-LSH / SimHash / Jaccard /
  *    fuzzy / cluster / incremental dedup + CDC chunking
  *  - [[AnnQueries]] — brute cosine, RP-LSH, IVF-Flat, PQ/ADC,
  *    IVF-PQ (plain + residual), SemDeDup, int8 ANN
  *  - [[TextQueries]] — lang-ID, quality, tokens, tf-idf, winnowing,
  *    heavy hitters, BM25/boolean retrieval, LM scoring
  *  - [[CurationQueries]] — decontam, PII, sampling, packing,
  *    chunking, caps, funnel, deterministic shuffle/mixing
  *  - [[MultimodalQueries]] — binary metadata + real header decodes
  *  - [[CapstoneQueries]] — end-to-end pipeline compositions
  *  - [[AnalyticsQueries]] — outliers/changepoints/retention/PageRank/
  *    BPE training/association rules/trend/seasonality
  *
  * This object remains the single aggregation point [[Registry]]
  * consumes; the driver contract (names, plans, oracles) is
  * unchanged by the split.
  */
object ExtensionQueries {
  val all: Seq[Q] =
    DedupQueries.all ++ AnnQueries.all ++ TextQueries.all ++
      CurationQueries.all ++ MultimodalQueries.all ++ CapstoneQueries.all ++
      AnalyticsQueries.all
}
