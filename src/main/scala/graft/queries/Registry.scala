package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables (the correctness oracle).
  *
  * Parity rules every entry obeys (SURVEY.md §5.2):
  *  - identical output column names on both sides (driver sorts columns
  *    by name before hashing);
  *  - a deterministic total ORDER BY on both sides;
  *  - floating-point aggregates rounded (both sides) so accumulation-order
  *    ulp noise can't flip the hash;
  *  - no nullable sort keys (Spark defaults NULLS FIRST, DuckDB NULLS LAST).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  def all: Seq[Q] =
    ReferenceQueries.all ++ SummaryQueries.all ++ LakeQueries.all ++
      CatalogQueries.all ++ ExtensionQueries.all ++ MvQueries.all

  /** query name → tier (the per-domain source file), so the bench can
    * report per-tier subtotals and rounds can see tier-level drift at a
    * glance without eyeballing 167 per-query numbers. */
  def tierOf: Map[String, String] = Seq(
    ReferenceQueries.all -> "reference",
    SummaryQueries.all -> "summary",
    LakeQueries.all -> "lake",
    CatalogQueries.all -> "catalog",
    DedupQueries.all -> "dedup",
    AnnQueries.all -> "ann",
    TextQueries.all -> "text",
    CurationQueries.all -> "curation",
    MultimodalQueries.all -> "multimodal",
    CapstoneQueries.all -> "capstone",
    AnalyticsQueries.all -> "analytics",
    MvQueries.all -> "mv"
  ).flatMap { case (qs, tier) => qs.map(_.name -> tier) }.toMap
}
