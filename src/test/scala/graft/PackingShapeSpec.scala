package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-18 scale-shape modes proven ROW-IDENTICAL to their window-form
  * twins — the two escape hatches older scaladoc argued and this round
  * implements: t19b (sharded stream-key packing) and t20b (per-source cap
  * pushdown). Each test asserts the identity AND the plan property that
  * makes the new form the 100 TB one.
  */
class PackingShapeSpec extends SparkSuite {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.count() // force AQE to finalize
    df.queryExecution.executedPlan.toString
  }

  test("t19b: sharded stream-key packing == flat per-lang packing; local window bounded by (lang, shard)") {
    val dir = sf("sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang", "n_tokens", "pack_idx", "pack_offset",
          "spans_packs")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))).toSet
    // integer prefix sums are associative-exact: carry + local offset
    // must equal the flat running sum ROW FOR ROW
    assert(rows(TextAnalysis.tokenPackingSharded(spark, dir)) ==
      rows(TextAnalysis.tokenPacking(spark, dir)))
    // the per-doc window partitions on (lang, shard) — a lang's stream
    // is never one unbounded window partition in this form
    val plan = executedPlan(TextAnalysis.tokenPackingSharded(spark, dir))
    val docWindow = plan.linesIterator.find(l =>
      l.contains("windowspecdefinition") && l.contains("n_tokens"))
    assert(docWindow.exists(l => l.contains("shard")),
      s"per-doc window not sharded:\n${docWindow.getOrElse(plan.take(800))}")
  }

  test("t19b: NULL-lang documents survive the carry join (null-safe key)") {
    import spark.implicits._
    // a window's PARTITION BY keeps NULL lang as its own stream — the
    // sharded form's carry join must too (a plain equi-join on lang is
    // null-rejecting and silently dropped these rows; the corpus
    // fixture has no NULL langs, so this probe pins the regression).
    // Docs 1/65 sit in DIFFERENT shards (shardDocs 64), so the NULL
    // stream exercises the cross-shard carry, not just the local sum.
    val tmp = java.nio.file.Files.createTempDirectory("graft_t19b").toString
    Seq((1L, "a b c", null.asInstanceOf[String], "s", 1L),
        (2L, "d e", "en", "s", 1L),
        (65L, "f g h i", null.asInstanceOf[String], "s", 1L),
        (66L, "j", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "lang", "n_tokens", "pack_idx", "pack_offset")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val flat = rows(TextAnalysis.tokenPacking(spark, tmp))
    val sharded = rows(TextAnalysis.tokenPackingSharded(spark, tmp))
    assert(flat.size == 4) // nothing dropped in either form
    assert(sharded == flat)
    // the NULL stream accumulated across shards: doc 65's offset is
    // doc 1's token count (3), not 0
    assert(sharded.exists(r => r._1 == 65L && r._2 == null && r._5 == 3L))
  }

  test("t20b: cap pushdown == ranking window (same comparator) == t20's kept set; partial top_k, no corpus window") {
    val dir = sf("sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "source", "src_rank")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val push = rows(TextAnalysis.perSourceCapPushdown(spark, dir))
    // row-identical to a ranking window under the SAME 52-bit comparator
    assert(push == rows(TextAnalysis.perSourceCapWindow52(spark, dir)))
    // ... and to t20's full-md5 kept set: the fixture has no 52-bit
    // prefix ties, so the two comparators induce the same sample
    assert(push == rows(graft.operators.TextAnalysis.perSourceCap(spark, dir)
      .filter(col("kept"))))
    // the scale property: map-side partial top_k prunes BEFORE the
    // exchange, and no ranking window (hence no per-source full sort of
    // the corpus) appears anywhere in the plan
    val plan = executedPlan(TextAnalysis.perSourceCapPushdown(spark, dir))
    assert(plan.contains("partial_top_k"), plan.take(800))
    assert(!plan.contains("windowspecdefinition"),
      "cap pushdown must not fall back to a ranking window")
  }
}
