package graft.sqlsurface

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin MySQL→Spark SQL translation for the ad-hoc pass-through surface
  * (SURVEY §2.11, §7.4). The reference forwards raw user SQL to MySQL
  * (sql_to_playlist:58-71, playlistlinks.py:177-184); users switching to
  * this engine keep their query text, with the dialect quirks mapped:
  *
  *   - `REGEXP BINARY 'p'` (case-sensitive) → `RLIKE 'p'` (Spark rlike is
  *     case-sensitive by default);
  *   - bare `REGEXP 'p'` (MySQL default = case-INsensitive) → `RLIKE '(?i)p'`;
  *   - `LIKE` under MySQL's default CI collation → `ILIKE` (opt-in flag,
  *     since exact-case LIKE also exists in the wild);
  *   - `ISNULL(x)` needs no mapping (Spark ships isnull());
  *   - backtick quoting is identical.
  *
  * Rewrites are applied OUTSIDE quoted regions only: the SQL text is split
  * into single-quoted string literals (with `''` escapes), backtick-quoted
  * identifiers (with ``` `` ``` escapes), and plain segments — keywords
  * inside a literal like `WHERE note = 'we LIKE it'` pass through untouched.
  * `REGEXP <non-literal>` (column/expr pattern) stays an operator Spark also
  * accepts, case-sensitively — the CI injection needs a literal to edit;
  * documented limitation of the token-level approach. A literal pattern
  * reached through opening parens (`REGEXP ('p')`) IS recognized (the
  * pending-CI scan looks through `(`); a literal built by concatenation
  * (`REGEXP 'a' || col`) gets the flag on its leading literal, which `(?i)`
  * semantics make correct for the whole concatenated pattern.
  */
object MySqlDialect {

  // one quoted region: a '…' literal (backslash escapes — MySQL's default
  // sql_mode — plus doubled-quote escapes) or a `…` identifier
  private val quotedRegion = "'(?:[^'\\\\]|\\\\.|'')*'|`(?:[^`]|``)*`".r

  def translate(sql: String, caseInsensitiveLike: Boolean = true): String = {
    val out = new StringBuilder
    // set when a plain segment ends in bare REGEXP: the literal that follows
    // is the pattern and gets the (?i) MySQL-default-collation flag injected
    var pendingCi = false
    var last = 0
    def plain(seg: String): String = {
      var s = seg
      s = s.replaceAll("(?i)\\bREGEXP\\s+BINARY\\b", "RLIKE")
      // segment ending in REGEXP, possibly through opening parens
      // (`REGEXP ('p')`): the literal that follows is still the pattern
      if (s.matches("(?is).*\\bREGEXP[\\s(]*")) {
        s = s.replaceAll("(?is)\\bREGEXP([\\s(]*)$", "RLIKE$1")
        pendingCi = true
      }
      if (caseInsensitiveLike) s = s.replaceAll("(?i)\\bLIKE\\b", "ILIKE")
      s
    }
    quotedRegion.findAllMatchIn(sql).foreach { m =>
      out ++= plain(sql.substring(last, m.start))
      val q = m.matched
      if (pendingCi && q.startsWith("'")) out ++= "'(?i)" + q.substring(1)
      else out ++= q
      pendingCi = false
      last = m.end
    }
    out ++= plain(sql.substring(last))
    out.toString
  }

  /** Translate then run against the registered views. */
  def sql(spark: SparkSession, mysqlSql: String): DataFrame =
    spark.sql(translate(mysqlSql))
}
