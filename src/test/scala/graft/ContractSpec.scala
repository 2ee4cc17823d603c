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

  test("HUGEINT guard: sum-derived intdiv/mod never reaches a SELECT alias un-CAST") {
    // DuckDB's sum(BIGINT) returns HUGEINT; `//` and `%` keep it HUGEINT
    // and it lands in pandas as float64, which the driver's hash rejects
    // against Spark's int64 (round-10 t19: `off // 256 AS pack_idx`).
    // Static rule over every oracle that uses sum(): an intdiv/mod result
    // aliased DIRECTLY to an output name (`x // n AS alias`) is the bug
    // shape and must instead be wrapped `CAST(x // n AS BIGINT) AS alias`.
    // The two are distinguishable textually: output aliases are
    // lowercase, CAST targets (AS BIGINT / AS INT) are uppercase.
    val bugShape = "(//|%)\\s*\\w+\\s+AS\\s+[a-z_]+".r
    // intdiv over a BASE parquet column (BIGINT in, BIGINT out — no sum
    // anywhere upstream of the operand) is provably not the HUGEINT
    // shape; pinned here by exact text so any edit re-trips the guard
    val safeBaseColumn = Set(
      "p_partkey // 4 AS parent",
      // tenancy tags over base id columns (BIGINT % INTEGER → BIGINT,
      // no sum upstream of the operand — the d58/d59/d60/s21 census
      // oracles; hash-checked int64 against the driver)
      "a.doc_id % 2 AS tenant",
      "a.vec_id % 2 AS tenant",
      "vec_id % 2 AS tenant",
      "x.vec_id % 2 AS tenant",
      "id_a % 2 AS tenant")
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      if (!sql.contains("sum(")) Nil
      else sql.linesIterator.zipWithIndex.collect {
        case (line, i) if bugShape.findFirstIn(line).isDefined &&
            !safeBaseColumn.exists(line.contains) =>
          s"$name line ${i + 1}: ${line.trim}"
      }.toList
    }
    assert(offenders.isEmpty,
      s"un-CAST sum-derived intdiv/mod aliased in oracle SELECT:\n${offenders.mkString("\n")}")
  }
}
