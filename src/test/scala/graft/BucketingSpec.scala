package graft

import org.apache.spark.sql.functions._

/** Bucketing evidence (PERF.md "100 TB extrapolation"): pre-bucketing both
  * join sides on the join key removes the per-query shuffle entirely — the
  * storage layout IS the exchange. This is the plan shape the a6-class
  * joins adopt at 100 TB instead of broadcasting.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // tables land in the default ./spark-warehouse (gitignored); the
    // warehouse dir is a static conf and cannot be moved per-test
    val dir = sf("sf0.001")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Tables.lineitem(spark, dir).select("l_orderkey", "l_discount")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

    // disable broadcast so the join must pick SMJ — bucketing then elides
    // BOTH shuffle exchanges under the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      // the ONLY shuffle in the whole plan is the final aggregation's —
      // the join inputs read pre-bucketed files with no exchange
      val shuffles = "(?<!Broadcast)Exchange".r.findAllIn(plan).length
      assert(shuffles == 1, s"expected 1 shuffle (final agg), got $shuffles:\n${plan.take(1500)}")
      assert(plan.contains("SelectedBucketsCount"), "bucket metadata missing from scan")

      // and the result matches the unbucketed computation
      val expected = graft.operators.Library.playlistStats(spark, dir)
        .groupBy("priority").agg(sum("n").cast("long").as("n"))
        .orderBy("priority").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val got = joined.orderBy("o_orderpriority").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
