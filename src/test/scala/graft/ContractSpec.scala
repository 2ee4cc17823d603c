package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants on SparkEntry itself — a new gate query that
  * forgets its oracle (or an oracle whose query vanished) fails HERE, not
  * in the next correctness round.
  */
class ContractSpec extends AnyFunSuite {

  /** Queries deliberately without a DuckDB oracle (engine-specific output);
    * must stay in lock-step with CLAUDE.md / COVERAGE.md's rows-only list.
    * EMPTY since round 5: sketch queries (a2b, a16b) ship exact values plus
    * deterministic error-band flags instead of raw estimates, so every gate
    * query hash-checks.
    */
  private val rowsOnly = Set.empty[String]

  test("every gate query has an oracle unless documented rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: ${missing.toSeq.sorted}")
  }

  test("no orphan oracles (oracle keys are a subset of query keys)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: ${orphans.toSeq.sorted}")
  }

  test("rows-only exemptions actually exist as queries") {
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet))
    assert((rowsOnly & SparkEntry.oracleSql.keySet).isEmpty,
      "a rows-only query gained an oracle — drop it from the exemption list")
  }
}
