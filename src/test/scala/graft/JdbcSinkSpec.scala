package graft

import graft.ingest.JdbcSink
import org.apache.spark.sql.functions._

/** Contract test for the JDBC load path against an embedded Derby target
  * (in-memory, real JDBC metadata + writes — the portable stand-in for the
  * reference's MySQL, itdbloader.py:202-237).
  */
class JdbcSinkSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def readBack(table: String): Map[Int, (String, Int)] =
    spark.read.jdbc(url, table, new java.util.Properties())
      .collect().map(r => r.getAs[Int]("id") ->
        (r.getAs[String]("name"), r.getAs[Int]("mtime"))).toMap

  test("REPLACE INTO: incoming batch replaces same-PK stored rows, last arrival wins in-batch") {
    val t = "t_replace"
    Seq((1, "old1", 10), (2, "old2", 10)).toDF("id", "name", "mtime")
      .write.mode("overwrite").jdbc(url, t, new java.util.Properties())
    val batch = Seq((2, "new2a", 20), (2, "new2b", 30), (3, "new3", 20))
      .toDF("id", "name", "mtime")
    JdbcSink.replaceInto(spark, batch, Seq("id"), col("mtime"), url, t)
    assert(readBack(t) == Map(
      1 -> ("old1", 10),   // untouched PK survives
      2 -> ("new2b", 30),  // replaced; within batch the LAST arrival wins
      3 -> ("new3", 20)))  // new PK inserted
  }

  test("LOAD DATA IGNORE: stored rows win, first arrival wins in-batch") {
    val t = "t_ignore"
    Seq((1, "old1", 10), (2, "old2", 10)).toDF("id", "name", "mtime")
      .write.mode("overwrite").jdbc(url, t, new java.util.Properties())
    val batch = Seq((2, "new2", 20), (3, "new3a", 20), (3, "new3b", 30))
      .toDF("id", "name", "mtime")
    JdbcSink.insertIgnore(spark, batch, Seq("id"), col("mtime"), url, t)
    assert(readBack(t) == Map(
      1 -> ("old1", 10),
      2 -> ("old2", 10),   // stored row keeps its PK
      3 -> ("new3a", 20))) // within batch the FIRST arrival wins
  }

  test("first load: missing table is created from the batch alone") {
    val t = "t_fresh"
    val batch = Seq((1, "a", 1), (1, "b", 2)).toDF("id", "name", "mtime")
    JdbcSink.replaceInto(spark, batch, Seq("id"), col("mtime"), url, t)
    assert(readBack(t) == Map(1 -> ("b", 2)))
  }
}
