package graft

import graft.operators.Library
import org.apache.spark.sql.functions._

/** Plan-shape regression guard: the properties the 100 TB design depends on
  * must survive refactors — broadcast dims, pushed filters, pruned scans.
  */
class PlanSpec extends SparkSuite {
  import spark.implicits._

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.count() // force AQE to finalize
    df.queryExecution.executedPlan.toString
  }

  test("a6 flagship: broadcast join + partial/final hash aggregation") {
    val plan = executedPlan(Library.playlistStats(spark, sf("sf0.001")))
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
    assert(!plan.contains("SortMergeJoin"))
    assert(plan.contains("HashAggregate"))
  }

  test("j2: literal filter pushed into the parquet scan, columns pruned") {
    val df = Library.joinLiteralFilter(spark, sf("sf0.001"))
    val formatted = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(out) { df.explain("formatted") }
      out.toString
    }
    assert(formatted.contains("EqualTo(o_orderpriority,1-URGENT)"), formatted.take(1000))
    assert(formatted.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int"))
  }

  test("x1: key predicate reaches PushedFilters") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(out) {
      graft.operators.Scalars.starsRoundtrip(spark, sf("sf0.001")).explain("formatted")
    }
    assert(out.toString.contains("LessThan(l_orderkey,100)"))
  }

  test("dedup/ANN pipeline: no cartesian or nested-loop joins anywhere") {
    // every near-dup/ANN stage must pair rows through an EQUI join on its
    // blocking key — a cartesian/nested-loop appearing here is the O(n²)
    // regression this guard exists for
    val dir = sf("sf0.001")
    val plans = Seq(
      "d3" -> graft.operators.Dedup.minhashLshPairs(spark, dir),
      "d4" -> graft.operators.Dedup.ngramJaccardPairs(spark, dir),
      "d6" -> graft.operators.Dedup.embeddingNearDupsBounded(spark, dir),
      "d8" -> graft.operators.Dedup.embeddingNearDupsLsh(spark, dir),
      "s2" -> graft.operators.Similarity.lshTopK(spark, dir))
    for ((name, df) <- plans) {
      val plan = executedPlan(df)
      assert(!plan.contains("CartesianProduct"), s"$name plan has a CartesianProduct")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name plan has a nested-loop join")
    }
  }

  test("d3: persisted shingle table is scanned from cache, not recomputed") {
    val plan = executedPlan(graft.operators.Dedup.minhashLshPairs(spark, sf("sf0.001")))
    assert(plan.contains("InMemoryTableScan"),
      "shared shingle projection should come from the per-(session,dir) cache")
  }

  test("s1/s4: the only non-equi join is the bounded broadcast probe side") {
    // brute-force ANN: corpus x broadcast(tiny probes) is the intended plan —
    // nested-loop is fine ONLY because one side is broadcast and bounded
    val s1 = executedPlan(graft.operators.Similarity.bruteForceTopK(spark, sf("sf0.001")))
    assert(s1.contains("BroadcastNestedLoopJoin"))
    assert(!s1.contains("CartesianProduct"))
    // IVF: probe x broadcast(centroids) ranking is the bounded cross product;
    // the in-cluster search itself must be an equi join on label
    val s4 = executedPlan(graft.operators.Similarity.ivfTopK(spark, sf("sf0.001")))
    assert(!s4.contains("CartesianProduct"))
    assert(s4.contains("BroadcastHashJoin") || s4.contains("BroadcastNestedLoopJoin"))
  }

  test("t7/t8/d9: text-analysis and clustering plans stay equi-join + hash-agg") {
    val dir = sf("sf0.001")
    for ((name, df) <- Seq(
      "t7" -> graft.operators.TextAnalysis.repetition(spark, dir),
      "t8" -> graft.operators.TextAnalysis.filterFunnel(spark, dir),
      "d9" -> graft.operators.Dedup.nearDupClusters(spark, dir))) {
      val plan = executedPlan(df)
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian product")
      if (name == "t8")
        assert(!plan.contains("SortMergeJoin"),
          "t8 joins tiny per-doc scalars — should broadcast, not sort-merge")
      assert(plan.contains("HashAggregate"), s"$name lost its hash aggregation")
    }
  }

  test("salted join: result identical to plain join, salt column gone") {
    val fact = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d")).toDF("k", "payload")
    val dim = Seq((1, "dim1"), (2, "dim2")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).orderBy("k", "payload")
      .collect().map(_.toSeq).toSeq
    val salted = Library.saltedJoin(fact, dim, "k", salts = 4)
      .select("k", "payload", "name").orderBy("k", "payload")
      .collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }
}
