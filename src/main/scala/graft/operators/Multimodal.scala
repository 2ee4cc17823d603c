package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side contract is real and tested — schema, partitioning, batch
  * shape (mapPartitions over the typed Dataset, one iterator per partition,
  * mirroring an Arrow-batch UDF), metadata struct columns. The actual codec
  * step is STUBBED with a deterministic fake (this container has no
  * image/audio libraries): `decodeStub` derives pseudo width/height/duration
  * from the payload bytes so tests are reproducible. Swapping in a real
  * decoder changes ONLY the body of `decodePartition`.
  *
  * At 100 TB the payloads dominate: every stage below is map-side (no
  * shuffle of binary data), metadata-only rollups aggregate scalars, and the
  * binary column never appears in a join or group-by key.
  */
object Multimodal {

  case class MediaRow(media_id: Long, payload: Array[Byte], kind: String)
  case class DecodedMeta(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, duration_ms: Long, magic: String)

  /** Manufacture an opaque-binary media table from documents: payload =
    * utf-8 bytes, kind assigned round-robin. In a real pipeline this is
    * `spark.read.format("binaryFile")` (SURVEY S8).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"))

  /** STUB decode — deterministic fake standing in for a real codec.
    * Signature and batch shape (Iterator[MediaRow] => Iterator[DecodedMeta],
    * one call per partition) are the real contract.
    */
  private def decodePartition(rows: Iterator[MediaRow]): Iterator[DecodedMeta] =
    rows.map { r =>
      val n = r.payload.length
      // ??? real codec goes here; fake fields are pure functions of bytes
      val firstBytes = r.payload.take(4).map(b => f"${b & 0xff}%02x").mkString
      DecodedMeta(r.media_id, r.kind, n,
        width = 16 + (n % 640), height = 16 + (n % 480),
        duration_ms = n.toLong * 10, magic = firstBytes)
    }

  /** Decode stage: typed mapPartitions over the media Dataset. */
  def decoded(spark: SparkSession, dir: String): Dataset[DecodedMeta] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow].mapPartitions(decodePartition)
  }

  /** Metadata-only query: binary length + magic-prefix + per-kind rollup,
    * all expressible as columnar builtins (the payload itself is opaque).
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"),
        lower(hex(substring(col("payload"), 1, 4))).as("magic"))

  /** Per-kind media stats over the decoded metadata. */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    decoded(spark, dir).toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        max(col("width")).as("max_width"))

  /** Frame sampling: videos explode into every-nth-frame rows — generator
    * shape via sequence+explode, no custom Generator needed.
    */
  def frameSample(spark: SparkSession, dir: String, everyMs: Long = 5000): DataFrame =
    decoded(spark, dir).toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("duration_ms"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("frame_ts_ms"))
}
