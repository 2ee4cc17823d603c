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
  * This is a pragmatic token-level rewrite for the reference's observed
  * query shapes, not a full MySQL grammar — documented limitation.
  */
object MySqlDialect {

  def translate(sql: String, caseInsensitiveLike: Boolean = true): String = {
    var s = sql
    // REGEXP BINARY -> RLIKE (case-sensitive on both sides)
    s = s.replaceAll("(?i)\\bREGEXP\\s+BINARY\\b", "RLIKE")
    // bare REGEXP 'pat' -> RLIKE '(?i)pat' (MySQL default collation is CI)
    s = s.replaceAll("(?i)\\bREGEXP\\s+'", "RLIKE '(?i)")
    if (caseInsensitiveLike)
      s = s.replaceAll("(?i)(?<![RI])\\bLIKE\\b", "ILIKE")
    s
  }

  /** Translate then run against the registered views. */
  def sql(spark: SparkSession, mysqlSql: String): DataFrame =
    spark.sql(translate(mysqlSql))
}
