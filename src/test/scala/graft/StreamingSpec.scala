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
}
