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
}
