package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-key load policies (SURVEY §7.4, S3/S4):
  *
  *   - MySQL `REPLACE INTO` keeps the LAST row per primary key
  *     (itdbloader.py:202-211);
  *   - `LOAD DATA ... IGNORE` keeps the FIRST (itdbloader.py:226-237).
  *
  * `dropDuplicates` is order-nondeterministic, so both are implemented as a
  * row_number window over an explicit arrival ordering — the semantics are
  * pinned, reproducible, and shuffle exactly once on the key.
  */
object Upsert {

  private def keepOne(df: DataFrame, pk: Seq[String], ord: Column): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(ord)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** REPLACE INTO: last write (by `arrival` descending) wins. */
  def replaceLastWins(df: DataFrame, pk: Seq[String], arrival: Column): DataFrame =
    keepOne(df, pk, arrival.desc)

  /** LOAD DATA IGNORE: first write (by `arrival` ascending) wins. */
  def ignoreFirstWins(df: DataFrame, pk: Seq[String], arrival: Column): DataFrame =
    keepOne(df, pk, arrival.asc)
}
