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
