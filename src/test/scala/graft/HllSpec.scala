package graft

import graft.plans.HllAgg
import org.apache.spark.sql.functions._

class HllSpec extends SparkSuite {

  test("HLL sketch estimates distinct counts within ~3% at p=11") {
    val dir = sf("sf0.01")
    val li = Tables.lineitem(spark, dir)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      HllAgg.hllDistinct(col("l_partkey")).as("approx")).collect().head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    val err = math.abs(approx - exact) / exact
    assert(err < 0.05, s"exact=$exact approx=$approx err=$err")
  }

  test("HLL merges across groups and partitions consistently") {
    val dir = sf("sf0.01")
    val li = Tables.lineitem(spark, dir).repartition(8)
    // per-flag sketches on a repartitioned input must equal the
    // single-partition run (merge correctness)
    val a = li.groupBy("l_returnflag")
      .agg(HllAgg.hllDistinct(col("l_suppkey")).as("n"))
      .orderBy("l_returnflag").collect().map(_.getLong(1)).toSeq
    val b = Tables.lineitem(spark, dir).coalesce(1).groupBy("l_returnflag")
      .agg(HllAgg.hllDistinct(col("l_suppkey")).as("n"))
      .orderBy("l_returnflag").collect().map(_.getLong(1)).toSeq
    assert(a == b)
  }

  test("HLL small-cardinality linear counting is near-exact") {
    import spark.implicits._
    val got = (1 to 100).map(i => i % 7).toDF("v")
      .agg(HllAgg.hllDistinct($"v")).collect().head.getLong(0)
    assert(got == 7L)
  }

  test("stored sketches merge register-identically to the one-shot sketch") {
    import spark.implicits._
    val rows = (1 to 5000).map(i => (i % 37, s"user${i % 911}")).toDF("day", "u")
    // one-shot sketch over the whole stream
    val whole = rows.agg(HllAgg.hllSketch($"u")).collect().head.getAs[Array[Byte]](0)
    // daily cells (the persisted state), then merged back — must be the
    // SAME registers, not just a close estimate (max is associative,
    // commutative, idempotent)
    val daily = rows.groupBy($"day").agg(HllAgg.hllSketch($"u").as("sk"))
    val mergedEst = daily.agg(HllAgg.hllMerge($"sk")).collect().head.getLong(0)
    assert(mergedEst == HllAgg.estimate(whole))
    // idempotence: merging the daily cells TWICE (replay) changes nothing
    val replayed = daily.unionByName(daily)
      .agg(HllAgg.hllMerge($"sk")).collect().head.getLong(0)
    assert(replayed == mergedEst)
    // the estimate is genuinely close on this cardinality (911 users)
    assert(math.abs(mergedEst - 911.0) / 911.0 < 0.05, s"est=$mergedEst")
    // precision mismatch is an error, not a silent wrong answer
    val p10 = rows.agg(HllAgg.hllSketch($"u", precision = 10)).collect().head.getAs[Array[Byte]](0)
    val two = Seq(whole, p10).toDF("sk")
    intercept[Exception] { two.agg(HllAgg.hllMerge($"sk")).collect() }
    // empty input merges to 0
    val empty = Seq.empty[Array[Byte]].toDF("sk")
      .agg(HllAgg.hllMerge($"sk")).collect().head.getLong(0)
    assert(empty == 0L)
  }

  test("w13 rolling distinct: windowed sketch merge matches driver replay; flags true") {
    val dir = sf("sf0.001")
    val got = graft.operators.Library.rollingDistinctUsers(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val evs = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("us"), col("user_id"))
      .collect().map(r => (Math.floorDiv(r.getLong(0), 86400000000L), r.getLong(1)))
    val days = evs.map(_._1).toSet
    val expected = days.map { d =>
      (d, evs.filter(e => e._1 >= d - 6 && e._1 <= d).map(_._2).distinct.length.toLong)
    }
    assert(got.map(t => (t._1, t._2)) == expected)
    assert(got.forall(_._3), s"some band flag false")
    // the window genuinely rolls: some day's 7-day count exceeds its
    // single-day count
    val single = evs.groupBy(_._1).map { case (d, es) => d -> es.map(_._2).distinct.size }
    assert(got.exists(t => t._2 > single(t._1)))
  }

  test("a2c sketch rollup: state table round-trips through disk; flags true") {
    val dir = sf("sf0.001")
    val got = graft.operators.Library.sketchRollup(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.map(t => (t._1, t._2)) == exact)
    assert(got.forall(_._3), s"some band flag false: $got")
  }
}
