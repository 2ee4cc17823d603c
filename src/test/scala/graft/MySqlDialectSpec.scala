package graft

import graft.sqlsurface.MySqlDialect.translate
import org.scalatest.funsuite.AnyFunSuite

/** Dialect-translation edges: keywords inside quoted literals must pass
  * through untouched (token-level rewrite guard).
  */
class MySqlDialectSpec extends AnyFunSuite {

  test("REGEXP BINARY -> RLIKE, pattern literal untouched (case-sensitive)") {
    assert(translate("SELECT * FROM t WHERE name REGEXP BINARY '^Abc'") ==
      "SELECT * FROM t WHERE name RLIKE '^Abc'")
  }

  test("bare REGEXP -> RLIKE with (?i) injected into the pattern literal") {
    assert(translate("SELECT * FROM t WHERE name REGEXP '^abc'") ==
      "SELECT * FROM t WHERE name RLIKE '(?i)^abc'")
  }

  test("LIKE -> ILIKE; NOT LIKE -> NOT ILIKE; RLIKE/ILIKE untouched") {
    assert(translate("a LIKE 'x%' AND b NOT LIKE 'y%' AND c RLIKE 'z'") ==
      "a ILIKE 'x%' AND b NOT ILIKE 'y%' AND c RLIKE 'z'")
    assert(translate("a ILIKE 'x%'") == "a ILIKE 'x%'")
  }

  test("keywords inside string literals pass through untouched") {
    assert(translate("SELECT 'we LIKE it and REGEXP too' AS note FROM t") ==
      "SELECT 'we LIKE it and REGEXP too' AS note FROM t")
    // doubled-quote escape keeps the literal as ONE region
    assert(translate("SELECT 'it''s LIKE that' FROM t") ==
      "SELECT 'it''s LIKE that' FROM t")
    // backslash escape (MySQL default sql_mode) keeps it one region too
    assert(translate("SELECT 'it\\'s LIKE that' FROM t") ==
      "SELECT 'it\\'s LIKE that' FROM t")
  }

  test("backtick identifiers pass through; rewrites still apply around them") {
    assert(translate("SELECT `LIKE` FROM t WHERE `x` LIKE 'a%'") ==
      "SELECT `LIKE` FROM t WHERE `x` ILIKE 'a%'")
  }

  test("caseInsensitiveLike=false keeps LIKE exact") {
    assert(translate("a LIKE 'x%'", caseInsensitiveLike = false) == "a LIKE 'x%'")
  }

  test("REGEXP with non-literal pattern stays an operator (documented CS fallback)") {
    assert(translate("a REGEXP b") == "a REGEXP b")
  }

  test("parenthesized literal pattern still gets the (?i) MySQL-CI flag") {
    assert(translate("a REGEXP ('abc')") == "a RLIKE ('(?i)abc')")
    assert(translate("a REGEXP ( ( 'abc' ) )") == "a RLIKE ( ( '(?i)abc' ) )")
    // parenthesized NON-literal stays the CS operator like the bare form:
    // the pending-CI flag must not leak to a LATER unrelated literal
    assert(translate("a REGEXP (b) AND c = 'd'") == "a REGEXP (b) AND c = 'd'")
  }
}
