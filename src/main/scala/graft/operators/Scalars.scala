package graft.operators

import graft.Tables
import graft.functions.Exprs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY §2.8) exercised as whole queries — each
  * is a pure codegen'd projection over a table scan (column-pruned, no
  * shuffle except where an ORDER BY pins output determinism).
  */
object Scalars {

  /** X1/X2: star bucketing and its inverse as a projection. */
  def starsRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        starsFromDiscount(col("l_discount")).as("stars"))
      .withColumn("rating", ratingFromStars(col("stars")))
      .filter(col("l_orderkey") < 100)

  /** X3 (itdb2html.py:124-131): duration formatting h:mm:ss. */
  def formatTimes(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 200)
      .select(col("o_orderkey"),
        // floor-then-cast: double→long cast truncation differs across
        // engines (DuckDB rounds), floor is unambiguous
        formatTime(floor(col("o_totalprice")).cast("long")).as("dur"))

  /** X4 (itdb2html.py:63-71): filename sanitize. */
  def sanitizeNames(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") < 100)
      .select(col("p_partkey"), sanitizeFilename(col("p_name")).as("fname"))

  /** X5/X6 (playlistlinks.py:268-283): URL decode of an encoded location. */
  def urlCodec(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") < 100)
      .select(col("p_partkey"),
        url_decode(regexp_replace(col("p_name"), " ", "%20")).as("decoded"))

  /** X8 (itdb2html.py:173-179 capwords): capitalize each word. */
  def capWords(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") < 100)
      .select(col("p_partkey"), initcap(col("p_name")).as("capped"))

  /** X19 (playlistlinks.py:191-219): %-format path projection. */
  def formatPaths(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") < 100)
      .select(col("p_partkey"),
        format_string("%s/%s-%03d", col("p_brand"), col("p_type"), col("p_size")).as("path"))

  /** X20: basename/dirname path ops over a manufactured path. */
  def pathOps(spark: SparkSession, dir: String): DataFrame = {
    val path = concat_ws("/", col("p_brand"), col("p_type"), col("p_name"))
    Tables.part(spark, dir)
      .filter(col("p_partkey") < 100)
      .select(col("p_partkey"), basename(path).as("base"), dirname(path).as("dir"))
  }

  /** X21 (itdb2html.py:419-421): humanized numbers with thousands
    * separators (integer part — rounding-mode-neutral).
    */
  def humanizeNumbers(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 200)
      .select(col("o_orderkey"),
        format_number(floor(col("o_totalprice")).cast("long"), 0).as("pretty"))

  /** X13 tail fingerprint + md5 both exposed (dedup.py:133-143). */
  def contentHashes(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        sha2(substring(col("text"), -100, 100), 256).as("tail_sha"),
        md5(col("text")).as("full_md5"))

  /** X7 (itdb2html.py:170-171): HTML escape at the render surface. */
  def htmlEscape(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") < 100)
      .select(col("p_partkey"),
        escapeHtml(concat(lit("<"), col("p_name"), lit("> & \""), col("p_brand"), lit("\"")))
          .as("escaped"))

  /** X22 (itdb2html.py:133-149): star display per histogram bucket. */
  def starsRendered(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(starsFromDiscount(col("l_discount")).as("stars"))
      .agg(count(lit(1)).as("n"))
      .withColumn("display", starsDisplay(col("stars")))

  /** Batch time-window rollup over events (the batch twin of the streaming
    * path in streaming/EventsStream): hourly tumbling buckets via
    * date_trunc, count+sum per event type.
    */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).cast("string").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        // decimal-routed sum (order-independent) matching the oracle
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))

  /** X16 gate form (itdbmetadata.py:7 `$.streams[*].codec_type`): the test
    * tables carry no JSON-array column, so a deterministic ffprobe-style
    * document is CONSTRUCTED per documents-row (1 + doc_id%3 streams,
    * codec_type alternating video/audio) and the wildcard path is then
    * extracted by the real operator (ItdbOps.codecTypes — typed
    * from_json + transform). The extracted array is joined to a scalar
    * string so the gate compare can canonicalize rows.
    */
  def codecTypesFromDocs(spark: SparkSession, dir: String): DataFrame = {
    val streams = transform(
      sequence(lit(0), (col("doc_id") % 3).cast("int")),
      i => concat(lit("{\"codec_type\":\""),
        when(i % 2 === 0, lit("video")).otherwise(lit("audio")), lit("\"}")))
    val ffprobe = Tables.documents(spark, dir)
      .select(col("doc_id").as("Persistent_ID"),
        concat(lit("{\"streams\":["), array_join(streams, ","), lit("]}")).as("ffprobe"))
    ItdbOps.codecTypes(ffprobe)
      .select(col("Persistent_ID").as("media_id"),
        array_join(col("codec_types"), ",").as("codecs"))
  }
}
