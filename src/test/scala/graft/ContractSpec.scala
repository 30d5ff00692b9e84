package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants of SparkEntry: the correctness gate
  * (Verify → DuckDB compare) silently weakens for any query that drops
  * out of `oracleSql`, so the pairing is asserted rather than assumed. */
class ContractSpec extends AnyFunSuite {

  /** Queries deliberately WITHOUT an oracle (driver records a weaker
    * rows-only check) — each needs a written reason here. */
  private val rowsOnly = Set(
    // sketches (HLL++/quantile digests) are engine-specific by design;
    // ExtendedOpsSpec bounds them against their exact twins instead
    "approx_sketch")

  test("every query has oracle SQL, except the documented rows-only set") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === rowsOnly,
      s"queries without an oracle must be listed (with a reason) in " +
        s"rowsOnly; unexplained: ${(missing -- rowsOnly).mkString(", ")}")
  }

  test("no orphan oracle SQL (an oracle whose query was renamed away " +
       "would silently stop gating anything)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"orphan oracles: ${orphans.mkString(", ")}")
  }

  test("query names are stable snake_case identifiers") {
    SparkEntry.queries.keySet.foreach { k =>
      assert(k.matches("[a-z][a-z0-9_]*"), s"bad query name: $k")
    }
  }
}
