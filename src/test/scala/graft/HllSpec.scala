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
}
