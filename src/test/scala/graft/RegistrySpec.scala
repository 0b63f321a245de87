package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Registry hygiene: invariants of the driver contract that need no
  * SparkSession. */
class RegistrySpec extends AnyFunSuite {

  test("every registered query carries a DuckDB oracle (no rows-only checks)") {
    // q55 was the last no_oracle row (closed round 5 via the frozen
    // golden signatures) — a new rows-only query is a regression
    val missing = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty,
      s"queries without an oracle (driver degrades to rows-only): $missing")
  }

  test("query names are unique and follow the qNN_ convention") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(names.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")), {
      val bad = names.filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+"))
      s"non-conforming names: $bad"
    })
  }

  test("oracles end with a deterministic ORDER BY (driver hash compare)") {
    // single-row outputs need no order; everything else must carry one.
    // Allowlist kept minimal and stale-checked like PlanAuditSpec's.
    val singleRow = Set(
      "q57_catalog_staleness", // one staleness report row
      "q81_funnel",            // one funnel row
      "q87_event_interval_join", // one count row
      "q225_metadata_agg")     // one table-wide aggregate row
    val unordered = Registry.all
      .filter(q => q.oracle.exists(!_.toUpperCase.contains("ORDER BY")))
      .map(_.name).toSet
    assert((unordered -- singleRow).isEmpty,
      s"oracles without any ORDER BY: ${unordered -- singleRow}")
    assert((singleRow -- unordered).isEmpty,
      s"stale single-row exemptions (oracle gained an ORDER BY): ${singleRow -- unordered}")
  }
}
