package graft

import graft.operators.Scalars
import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSuite {

  test("streaming hourly agg over replayed events == batch rollup (§2.12)") {
    val dir = sf("sf0.001")
    val streamed = EventsStream.runToCompletion(spark, dir, "events_hourly_test")
      .select(col("hour").cast("string").as("hour"), col("event_type"), col("n"))
      .orderBy("hour", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

    val batch = Scalars.hourlyRollup(spark, dir)
      .select("hour", "event_type", "n").orderBy("hour", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup: one row per event_id, watermark-bounded state") {
    // the global-exactness assertion holds because the fixture is ONE file
    // replayed as one AvailableNow micro-batch; across batches the
    // guarantee is bounded by the watermark delay (see dedupedEvents doc)
    val dir = sf("sf0.001")
    val deduped = EventsStream.runDedupToCompletion(spark, dir, "events_dedup_test")
    val total = graft.Tables.events(spark, dir).count()
    val distinctIds = graft.Tables.events(spark, dir)
      .select("event_id").distinct().count()
    assert(deduped.count() == distinctIds)
    assert(deduped.select("event_id").distinct().count() == distinctIds)
    assert(total >= distinctIds)
  }

  test("session windows: builtin session_window under watermark, sane bounds") {
    val dir = sf("sf0.001")
    val q = EventsStream.sessionAgg(spark, dir).writeStream
      .outputMode("complete").format("memory").queryName("events_sessions")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sessions = spark.table("events_sessions").collect()
    assert(sessions.nonEmpty)
    sessions.foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("session_start")
        .after(r.getAs[java.sql.Timestamp]("session_end")))
      assert(r.getAs[Long]("n_events") >= 1)
    }
    // per-user event totals across sessions == raw counts
    val perUser = sessions.groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_events")).sum).toMap
    val raw = graft.Tables.events(spark, dir).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUser == raw)
  }

  test("mapGroupsWithState running totals == batch aggregation") {
    val dir = sf("sf0.001")
    val state = EventsStream.statefulTotals(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toMap
    val batch = graft.Tables.events(spark, dir).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(state == batch)
  }

  test("flatMapGroupsWithState sessionization: gap-close in batch, timeout-close by watermark") {
    // Spark 4.1 relocated MemoryStream under execution.streaming.runtime
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventsStream.TimedEvent
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // offset from epoch 0: an event whose time equals the initial watermark
    // (0) is dropped as late by the stateful operator
    def ts(minutes: Long) = new java.sql.Timestamp((1000 + minutes) * 60000L)
    val input = MemoryStream[TimedEvent]
    val q = EventsStream.sessionizeFlat(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("flat_sessions")
      .start()
    try {
      // batch 1: user 1 has two sessions separated by a > 30 min gap — the
      // FIRST closes within the batch (the flatMap emit), the second stays
      // open in state; user 2 has one open session
      input.addData(TimedEvent(1L, ts(0)), TimedEvent(1L, ts(5)),
        TimedEvent(1L, ts(60)), TimedEvent(2L, ts(10)))
      q.processAllAvailable()
      val afterBatch1 = spark.table("flat_sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000 - 1000,
          r.getTimestamp(2).getTime / 60000 - 1000, r.getLong(3))).toSet
      assert(afterBatch1 == Set((1L, 0L, 5L, 2L)), afterBatch1.toString)
      // batch 2: a far-future event advances the watermark (1 h delay) past
      // every open session's end + gap — the TIMEOUT path emits them
      input.addData(TimedEvent(3L, ts(600)))
      q.processAllAvailable()
      input.addData(TimedEvent(3L, ts(601)))
      q.processAllAvailable()
      val closed = spark.table("flat_sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000 - 1000,
          r.getTimestamp(2).getTime / 60000 - 1000, r.getLong(3))).toSet
      assert(closed.contains((1L, 60L, 60L, 1L)), closed.toString)
      assert(closed.contains((2L, 10L, 10L, 1L)), closed.toString)
    } finally q.stop()
  }
}
