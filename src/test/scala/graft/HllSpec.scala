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

  test("a16c percentile cells: exact columns replay, band flags hold, merge order is free") {
    val dir = sf("sf0.001")
    val got = graft.operators.Library.percentileSketchRollup(spark, dir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(3), r.getBoolean(4))).toSet
    // exact columns: driver replay of Spark's (n-1)·q linear interpolation
    def q(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted
      val rank = (s.length - 1) * p
      val lo = rank.toInt
      val frac = rank - lo
      val v = if (lo + 1 < s.length) s(lo) * (1 - frac) + s(lo + 1) * frac else s(lo)
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byType = Tables.events(spark, dir)
      .select(col("event_type"), col("value").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    val expected = byType.map { case (t, vs) =>
      (t, q(vs.map(_._2).toSeq, 0.5), q(vs.map(_._2).toSeq, 0.95), true, true)
    }.toSet
    assert(got == expected && got.nonEmpty)
    // the digest classes themselves: split-half digests merged in EITHER
    // order estimate within the exact p±0.01 rank band (the guarantee is
    // merge-order-free even though the bytes are not)
    import org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile.PercentileDigest
    val vals = (1 to 5000).map(_ => scala.util.Random.nextDouble() * 100)
    def digestOf(xs: Seq[Double]) = {
      val d = new PercentileDigest(1.0 / 10000)
      xs.foreach(d.add); d
    }
    val (h1, h2) = vals.splitAt(2200)
    val ab = digestOf(h1); ab.merge(digestOf(h2))
    val ba = digestOf(h2); ba.merge(digestOf(h1))
    for (d <- Seq(ab, ba); p <- Seq(0.5, 0.95)) {
      val est = d.getPercentiles(Array(p)).head.asInstanceOf[Double]
      val lo = vals.sorted.apply(((vals.length - 1) * (p - 0.01)).toInt)
      val hi = vals.sorted.apply(math.ceil((vals.length - 1) * (p + 0.01)).toInt)
      assert(est >= lo && est <= hi, s"p=$p est=$est outside [$lo,$hi]")
    }
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
