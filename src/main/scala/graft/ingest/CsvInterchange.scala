package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructType}

/** S2/S3 (SURVEY §2.1): the reference's CSV interchange — tracks are dumped
  * to quote-enclosed CSV with booleans encoded "1"/"0" (itdbloader.py:152-179,
  * X18) and bulk-loaded with `LOAD DATA ... IGNORE` (itdbloader.py:226-237).
  *
  * Under Spark the interchange hop is usually unnecessary (DataFrames load
  * directly), but the format must round-trip for compatibility with files
  * the reference produced. IGNORE's first-write-wins duplicate policy is
  * Upsert.ignoreFirstWins.
  */
object CsvInterchange {

  /** Write with the reference's conventions: no header, quote-enclosed,
    * booleans as 1/0.
    */
  def write(df: DataFrame, path: String): Unit = {
    val encoded = df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType == BooleanType)
        // null must stay null (absent plist keys), not collapse to "0"
        acc.withColumn(f.name,
          when(col(f.name).isNull, lit(null: String))
            .when(col(f.name), "1").otherwise("0"))
      else acc
    }
    encoded.write.mode("overwrite")
      .option("header", "false").option("quoteAll", "true")
      .csv(path)
  }

  /** Read back against the declared schema (bools arrive as "1"/"0"). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val stringSchema = StructType(schema.fields.map(f =>
      if (f.dataType == BooleanType) f.copy(dataType = org.apache.spark.sql.types.StringType)
      else f))
    val raw = spark.read.schema(stringSchema)
      .option("header", "false").option("quote", "\"")
      .csv(path)
    schema.fields.filter(_.dataType == BooleanType).foldLeft(raw) { (acc, f) =>
      acc.withColumn(f.name, col(f.name) === "1")
    }
  }
}
