package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions so ANY session built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.plans.GraftExtensions`) gets them in SQL —
  * the injection path for custom operators the build rules prescribe.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductExpr(exprs.head, exprs(1))))
    // aggregate builders return the unwrapped AggregateFunction — the
    // analyzer wraps it in an AggregateExpression during resolution.
    // TopKAgg.build validates arity + literal k with AnalysisExceptions.
    e.injectFunction((
      FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "top_k"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKAgg.build(exprs)))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashExpr.build(exprs)))
    e.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShinglesExpr].getName, "word_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShinglesExpr.build(exprs)))
  }
}

object GraftExtensions {
  /** Late-registration path for sessions that predate extension injection
    * (test suites, notebooks): the same builders through the live
    * FunctionRegistry — keeps one definition per function.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("simhash64",
      exprs => SimHashExpr.build(exprs), "built-in")
    r.createOrReplaceTempFunction("word_shingles",
      exprs => ShinglesExpr.build(exprs), "built-in")
  }
}
