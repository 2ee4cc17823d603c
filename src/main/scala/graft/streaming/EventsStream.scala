package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference has no streams (SURVEY §2.12
  * — its closest mechanisms are mtime freshness gates and incremental
  * re-checksumming), so this is the engine's forward-looking stream path:
  * the `events` table replayed as a file stream → watermarked tumbling
  * windows → aggregates, exactly the batch Scalars.hourlyRollup restated
  * incrementally.
  *
  * At scale this is the standard continuous-ingest topology: file/queue
  * source, event-time watermark bounding state, windowed partial aggregates
  * maintained per key in the state store.
  */
object EventsStream {

  /** events.parquet is TIMESTAMP(NANOS): under nanosAsLong the column reads
    * as LongType and is converted after the scan (same as Tables.events).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Hourly windowed counts/sums per event_type with a 1-hour watermark. */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      // file streams need a directory source; glob-filter to the one table
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Run the streaming query to completion over the static parquet (memory
    * sink, AvailableNow trigger) and return the materialized result — the
    * local-smoke harness recommended by the Spark guide.
    */
  def runToCompletion(spark: SparkSession, dir: String, name: String = "events_hourly"): DataFrame = {
    val q: StreamingQuery = hourlyAgg(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
