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
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

  private def eventSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Session windows per user (30-minute inactivity gap) — the builtin
    * `session_window` aggregation under a watermark; the Spark-first way to
    * sessionize before reaching for custom state.
    */
  def sessionAgg(spark: SparkSession, dir: String, gap: String = "30 minutes"): DataFrame =
    eventSource(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming dedup WITHIN the watermark horizon: drop repeated event_ids
    * across micro-batches with watermark-bounded state
    * (`dropDuplicatesWithinWatermark`) — the continuous-ingest twin of the
    * batch exact-dedup tier (Dedup.exactGroups). State holds one key per
    * event inside the horizon and is evicted as the watermark advances, so
    * a 100 TB/day stream keeps bounded state instead of an ever-growing
    * seen-set. The bound is the guarantee's limit too: a duplicate whose
    * occurrences are separated by more than the delay (and land in
    * different micro-batches) is NOT caught — global exactness needs the
    * batch tier over the settled data.
    */
  def dedupedEvents(spark: SparkSession, dir: String): DataFrame =
    eventSource(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run the streaming dedup to completion (memory sink, AvailableNow). */
  def runDedupToCompletion(spark: SparkSession, dir: String,
      name: String = "events_dedup"): DataFrame = {
    val q: StreamingQuery = dedupedEvents(spark, dir).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class OpenSession(start: Long, end: Long, n_events: Long)
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

  /** Custom sessionization via flatMapGroupsWithState — the state surface
    * for session logic `session_window` can't express (e.g. emitting a
    * session the moment it closes, enriching it from accumulated state).
    * Each invocation may emit 0..N CLOSED sessions for the group (hence
    * flatMap, not map): batch events are folded into the open session,
    * every gap > `gapMs` closes one, and the still-open tail stays in the
    * state store with an event-time timeout — when the watermark passes
    * `end + gap` with no new events, the timeout invocation emits it and
    * clears state. State per user is ONE open session (three longs), so a
    * 100 TB/day stream holds bounded state regardless of history length.
    *
    * Per-invocation sorting is over ONE user's events in ONE micro-batch —
    * bounded by batch sizing, not by stream history.
    */
  def sessionizeFlat(events: org.apache.spark.sql.Dataset[TimedEvent],
      gapMs: Long = 30L * 60 * 1000): org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[TimedEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap with no new events: the open
            // session is final — emit it and drop the state
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end), s.n_events))
          } else {
            val times = it.map(_.ts.getTime).toArray.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            times.foreach { t =>
              open match {
                case Some(s) if t - s.end <= gapMs =>
                  open = Some(OpenSession(s.start, math.max(s.end, t), s.n_events + 1))
                case Some(s) =>
                  closed += ClosedSession(uid, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end), s.n_events)
                  open = Some(OpenSession(t, t, 1L))
                case None =>
                  open = Some(OpenSession(t, t, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Custom arbitrary state via mapGroupsWithState: per-user running
    * totals maintained in the state store across micro-batches — the
    * KeyValueGroupedDataset state surface for logic session_window can't
    * express.
    */
  def statefulTotals(spark: SparkSession, dir: String, name: String = "events_state"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ds = eventSource(spark, dir)
      .select(col("user_id"), col("value")).as[UserEvent]
    val updated = ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          val next = events.foldLeft(prev)((acc, e) =>
            UserTotals(uid, acc.n_events + 1, acc.sum_value + e.value))
          state.update(next)
          next
      }
    val q = updated.toDF().writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
