package graft

import graft.operators.Library
import graft.plans.TopKAgg
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate (w9) must be row-for-row identical to the
  * window form (w2) — same ordering, same tiebreak — while planning as a
  * partial-aggregated ObjectHashAggregate (map-side top-k before the
  * shuffle, the property the window form cannot have).
  */
class TopKAggSpec extends SparkSuite {
  import spark.implicits._

  test("top-k aggregate == row_number window form on real data") {
    val dir = sf("sf0.001")
    val agg = Library.topNPerGroupAgg(spark, dir)
      .orderBy("o_orderpriority", "rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val win = Library.topNPerGroup(spark, dir)
      .orderBy("o_orderpriority", "rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(agg == win && agg.nonEmpty)
  }

  test("ties break by id ascending, overflow evicts the weakest") {
    val df = Seq(
      ("g", 5.0, 10L), ("g", 5.0, 3L), ("g", 5.0, 7L),  // tied scores
      ("g", 9.0, 99L), ("g", 1.0, 1L),
      ("h", 2.0, 2L)
    ).toDF("grp", "score", "id")
    val got = df.groupBy($"grp")
      .agg(TopKAgg.topK($"score", $"id", 3).as("top"))
      .select($"grp", posexplode($"top"))
      .select($"grp", $"pos", $"col.score", $"col.id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == Set(
      ("g", 0, 9.0, 99L), ("g", 1, 5.0, 3L), ("g", 2, 5.0, 7L),
      ("h", 0, 2.0, 2L)))
  }

  test("null scores and ids are skipped, never ranked") {
    val df = Seq(
      ("g", Some(5.0), Some(1L)), ("g", None, Some(2L)), ("g", Some(7.0), None)
    ).toDF("grp", "score", "id")
    val got = df.groupBy($"grp").agg(TopKAgg.topK($"score", $"id", 5).as("top"))
      .select(size($"top")).collect().head.getInt(0)
    assert(got == 1)
  }

  test("buffer round-trips through serialize/deserialize (shuffle path)") {
    val buf = new TopKAgg.Buffer(3)
    Seq((1.0, 5L), (3.0, 2L), (2.0, 9L), (4.0, 1L)).foreach { case (s, i) => buf.insert(s, i) }
    val back = TopKAgg.Buffer.fromBytes(3, buf.toBytes)
    val pairs = (0 until back.size).map(i => (back.scoreAt(i), back.idAt(i)))
    assert(pairs == Seq((4.0, 1L), (3.0, 2L), (2.0, 9L)))
  }

  test("plans as partial ObjectHashAggregate: map-side top-k before the shuffle") {
    val df = Library.topNPerGroupAgg(spark, sf("sf0.001"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(plan.contains("partial_top_k"), plan.take(800))
  }

  test("NaN scores sort like the window form (NaN outranks +Inf, evictable)") {
    val df = Seq(
      ("g", Double.NaN, 1L), ("g", Double.PositiveInfinity, 2L),
      ("g", 5.0, 3L), ("g", Double.NaN, 4L), ("g", 7.0, 5L)
    ).toDF("grp", "score", "id")
    val agg = df.groupBy($"grp").agg(TopKAgg.topK($"score", $"id", 3).as("top"))
      .select(posexplode($"top")).select($"col.id")
      .collect().map(_.getLong(0)).toSeq
    import org.apache.spark.sql.expressions.Window
    val win = df.withColumn("rn", row_number().over(
        Window.partitionBy($"grp").orderBy($"score".desc, $"id")))
      .filter($"rn" <= 3).orderBy($"rn")
      .select($"id").collect().map(_.getLong(0)).toSeq
    assert(agg == win)
    assert(agg == Seq(1L, 4L, 2L)) // NaN(id 1), NaN(id 4), +Inf
  }

  test("SQL path: mistyped args coerce via inputTypes; bad k raises AnalysisException") {
    import org.apache.spark.sql.AnalysisException
    TopKAgg.register(spark)
    spark.range(10).selectExpr("id % 2 AS g", "CAST(id AS INT) AS v", "id")
      .createOrReplaceTempView("tk_cast_probe")
    // INT score / BIGINT k literal: analyzer coercion, no runtime CCE
    val rows = spark.sql(
      "SELECT g, top_k(v, id, CAST(2 AS BIGINT)) AS top FROM tk_cast_probe GROUP BY g")
      .selectExpr("g", "top[0].id AS best")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((0L, 8L), (1L, 9L)))
    // wrong arity → WRONG_NUM_ARGS, not IndexOutOfBounds
    val e1 = intercept[AnalysisException](
      spark.sql("SELECT top_k(v, id) FROM tk_cast_probe"))
    assert(e1.getCondition.startsWith("WRONG_NUM_ARGS"), e1.getCondition)
    // non-foldable k → NON_FOLDABLE_ARGUMENT, not an obscure planner error
    val e2 = intercept[AnalysisException](
      spark.sql("SELECT g, top_k(v, id, CAST(g AS INT)) FROM tk_cast_probe GROUP BY g"))
    assert(e2.getCondition == "NON_FOLDABLE_ARGUMENT", e2.getCondition)
    // non-integral k literal is rejected too
    val e3 = intercept[AnalysisException](
      spark.sql("SELECT top_k(v, id, 2.5) FROM tk_cast_probe"))
    assert(e3.getCondition == "NON_FOLDABLE_ARGUMENT", e3.getCondition)
    // k < 1 → INVALID_PARAMETER_VALUE
    val e4 = intercept[AnalysisException](
      spark.sql("SELECT top_k(v, id, 0) FROM tk_cast_probe"))
    assert(e4.getCondition.startsWith("INVALID_PARAMETER_VALUE"), e4.getCondition)
  }

  test("top_k available in SQL via the GraftExtensions builder") {
    // the shared suite session predates extension injection; register the
    // same builder path directly (as PipelineSpec does for dot_product)
    TopKAgg.register(spark)
    spark.range(10).selectExpr("id % 2 AS g", "CAST(id AS DOUBLE) AS v", "id")
      .createOrReplaceTempView("tk_probe")
    val rows = spark.sql(
      "SELECT g, top_k(v, id, 2) AS top FROM tk_probe GROUP BY g ORDER BY g")
      .selectExpr("g", "top[0].id AS best")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((0L, 8L), (1L, 9L)))
  }
}
