package graft

import graft.functions.{Exprs, QualityAgg}
import graft.operators.Library
import org.apache.spark.sql.functions._

class QualityAggSpec extends SparkSuite {
  import spark.implicits._

  test("typed Aggregator == builtin pivot+expression composition (SURVEY §2.9)") {
    val dir = sf("sf0.001")
    val agg = udaf(QualityAgg)
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_discount"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority"))
    val typed = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(round(agg(Exprs.starsFromDiscount(col("l_discount"))), 4).as("quality"))
      .orderBy("grp")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

    val builtin = Library.qualityPerGroup(spark, dir)
      .select("grp", "quality").orderBy("grp")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

    assert(typed == builtin)
    assert(typed.nonEmpty)
  }

  test("Aggregator semantics: gate, merge, clamp") {
    // direct buffer-level checks
    val b = QualityAgg.zero
    Seq(5L, 5L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L).foreach(QualityAgg.reduce(b, _))
    assert(QualityAgg.finish(b) == 5.0) // 2/10 rated = exactly 20% -> OPEN (2*5 >= 10)
    QualityAgg.reduce(b, 0L)
    assert(QualityAgg.finish(b) == 0.0) // 2/11 rated < 20% -> closed (2*5 < 11)
    QualityAgg.reduce(b, 3L)
    assert(QualityAgg.finish(b) == (5 + 5 + 3) / 3.0) // 3/12 -> open (3*5 >= 12)
    val merged = QualityAgg.merge(QualityAgg.zero, b)
    assert(QualityAgg.finish(merged) == QualityAgg.finish(b))
    val clamped = QualityAgg.zero
    QualityAgg.reduce(clamped, 99L) // out-of-range stars clamps to 5
    assert(clamped(5) == 1L)
  }
}
