package graft.operators

import graft.Tables
import graft.functions.Exprs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over `documents`:
  * language ID (stopword-overlap heuristic), quality scoring, token
  * counting, and rolling-hash fingerprinting. All pure map-side columnar
  * expressions — a 100 TB corpus runs these with zero shuffle (the final
  * rollups aggregate tiny per-doc scalars, never text).
  */
object TextAnalysis {

  /** Tiny per-language marker lexicons for the heuristic scorer. Real
    * pipelines plug in fastText-style models here; the operator shape
    * (per-doc arg-max over per-language evidence scores) is what matters.
    */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "que"),
    "de" -> Seq("der", "die", "das", "und", "zu"))

  private def langScore(toks: Column, lex: Seq[String]): Column =
    size(array_intersect(toks, array(lex.map(lit): _*))).cast("double") / size(toks)

  /** Language-ID: score each document against each lexicon (fraction of
    * distinct marker tokens present), predict the best-scoring language or
    * 'und' when no evidence. greatest/when chain = deterministic arg-max
    * with fixed preference order on ties.
    */
  def languageId(spark: SparkSession, dir: String): DataFrame = {
    // distinct-token array materialized once; the per-language scores read
    // the attribute (4× tokenization otherwise — CollapseProject discipline)
    val withToks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), array_distinct(tokens(col("text"))).as("dt"))
    val scored = withToks
      .select(col("doc_id") +: col("lang") +:
        lexicons.map { case (l, lex) => round(langScore(col("dt"), lex), 4).as(s"score_$l") }: _*)
    val best = lexicons.map { case (l, _) => col(s"score_$l") }.reduce((a, b) => greatest(a, b))
    val predicted = lexicons.foldRight(lit("und")) { case ((l, _), els) =>
      when(best > 0 && col(s"score_$l") === best, lit(l)).otherwise(els)
    }
    scored.withColumn("predicted", predicted)
  }

  /** Quality scoring (length / punctuation ratio / stopword ratio / mean
    * token length) with a composite keep/drop signal — the Gopher-rule
    * shape. One projection, no shuffle.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = col("tk")
    val nToks = size(toks)
    val nChars = length(col("text"))
    val punct = length(regexp_replace(col("text"), "[^.,!?;:]", ""))
    val stop = size(array_intersect(array_distinct(toks),
      array(Seq("the", "a", "of", "and", "to", "in", "is").map(lit): _*)))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("tk"))
      .select(
      col("doc_id"),
      nChars.as("n_chars_measured"),
      nToks.as("n_tokens"),
      round(nChars.cast("double") / nToks, 4).as("mean_tok_len"),
      round(punct.cast("double") / nChars, 4).as("punct_ratio"),
      round(stop.cast("double") / nToks, 4).as("stopword_ratio"),
      (nToks >= 10 && nToks <= 100000 &&
        (nChars.cast("double") / nToks) >= 2.0).as("keep"))
  }

  /** Token counting: whitespace tokens plus a BPE-ish regex token count
    * (letter runs / digits / single non-space symbols) — the standard
    * pre-tokenizer approximation for LLM token budgeting.
    */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long").as("bpe_tokens"))

  /** Document fingerprinting: min-of-window-hashes (winnowing-style) — the
    * minimum md5 over word-5-gram windows is a robust content fingerprint
    * stable under small edits outside the minimal window.
    */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    val sh = graft.plans.ShinglesExpr.wordShingles(col("text"), 5)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      array_min(transform(sh, s => md5(s))).as("fingerprint"))
  }

  /** Corpus rollup: per (lang, source) doc counts, token totals, mean
    * quality signals — the summary a pipeline reports after scoring.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(toks)).cast("long").as("total_tokens"),
        round(avg(length(col("text"))), 4).as("avg_chars"))
  }

  /** Repetition signals (Gopher-style quality filters over token streams):
    * distinct-token ratio, most-frequent-token fraction, most-frequent-
    * bigram fraction. Top-frequency is computed DISTRIBUTED — explode to
    * (doc, token) and two hash aggregations — rather than any per-row map
    * structure: the shuffle carries small (doc_id, token) pairs and both
    * aggregations are partial+final, so a 100 TB corpus never materializes
    * a per-document frequency table in one task.
    */
  /** Corpus filter FUNNEL — the decision step of a training-data pipeline:
    * language confidence (t2), quality gate (t3) and repetition bounds (t7)
    * joined per doc, rolled up to survival counts per gate and overall.
    * Each component is its own oracle-proven operator; this is the
    * composition a 100 TB curation run executes before writing the kept
    * split. Joins are doc_id equi joins of per-doc scalars — no text
    * moves past the first projection of each branch.
    */
  def filterFunnel(spark: SparkSession, dir: String,
      maxTopTokenRatio: Double = 0.2, minDistinctRatio: Double = 0.3): DataFrame = {
    val lang = languageId(spark, dir)
      .select(col("doc_id"), (col("predicted") =!= "und").as("lang_ok"))
    val qual = qualityScore(spark, dir)
      .select(col("doc_id"), col("keep").as("quality_ok"))
    val rep = repetition(spark, dir)
      .select(col("doc_id"),
        (col("top_token_ratio") <= maxTopTokenRatio &&
          col("distinct_ratio") >= minDistinctRatio).as("rep_ok"))
    def n(c: Column): Column = sum(when(c, 1L).otherwise(0L)).cast("long")
    lang.join(qual, Seq("doc_id")).join(rep, Seq("doc_id"))
      .agg(count(lit(1)).as("n_docs"),
        n(col("lang_ok")).as("n_lang_ok"),
        n(col("quality_ok")).as("n_quality_ok"),
        n(col("rep_ok")).as("n_rep_ok"),
        n(col("lang_ok") && col("quality_ok") && col("rep_ok")).as("n_kept"))
  }

  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
    // token counts, distinct count AND top frequency all come out of the
    // single (doc, token)-level aggregation — no separate base-stats branch
    val tokStats = t.select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_tok"))
    val topBigram = t.select(col("doc_id"), explode(shingles(col("w"), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_bigram"))
    tokStats.join(topBigram, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 4).as("distinct_ratio"),
        round(col("top_tok").cast("double") / col("n_tokens"), 4).as("top_token_ratio"),
        // a 1-token doc has no bigram (shingles degenerates to the whole doc)
        when(col("n_tokens") > 1,
          round(col("top_bigram").cast("double") / (col("n_tokens") - 1), 4))
          .otherwise(lit(null)).as("top_bigram_ratio"))
  }
}
