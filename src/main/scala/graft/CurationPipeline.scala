package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end CURATION lifecycle facade — the LLM-pipeline analogue of
  * [[ItdbPipeline]] (SURVEY §3's load→stats→export, re-aimed at the
  * training-data flow this library exists for): raw documents →
  * decontaminated → exact-deduplicated → near-dup-canonicalized →
  * quality-filtered → source-capped → written as the split=…/lang=…
  * training corpus, with a per-stage funnel report (the t8 discipline
  * applied to the whole pipeline).
  *
  * Every stage IS a gate-checked operator (d10b screen, d1 digest
  * grouping, d9/d19 cluster canonical, t3 quality rule, t20 cap, e1
  * writer) — the pipeline adds only their composition, so its
  * correctness reduces to theirs plus the stage arithmetic the spec
  * checks (each stage's drop count + survivor count telescopes to the
  * kept total).
  *
  * Scale shape: stages communicate by doc_id frames (never text where a
  * flag suffices); the near-dup stage runs on the already screened +
  * exact-deduped survivors (the cheapest ordering — each stage shrinks
  * the next one's input); the final write is the e1 partitioned layout.
  */
object CurationPipeline {

  final case class Report(
      nDocs: Long,
      nQuarantined: Long,
      nExactDupDropped: Long,
      nNearDupDropped: Long,
      nQualityDropped: Long,
      nCapDropped: Long,
      nKept: Long)

  /** The funnel report extended through the packing stage: every kept
    * doc places (nPlaced == nKept — packing drops nothing with > 0
    * tokens), total tokens conserve, and nSequences = ⌈nTokens/seqLen⌉
    * — the telescoping arithmetic continued past the corpus write.
    */
  final case class PackedReport(
      curation: Report,
      nPlaced: Long,
      nTokens: Long,
      nSequences: Long)

  /** Run the full flow; returns (kept corpus frame as written, report).
    * `trainUpTo`/`valFrom` are the t9 split thresholds: only TRAIN-split
    * documents (bucket < trainUpTo) are decontaminated; the gram state
    * protects the ENTIRE held-out slice — val (buckets [trainUpTo,
    * valFrom)) and test (>= valFrom) alike — and held-out docs pass
    * through on their own split.
    */
  def run(spark: SparkSession, dir: String, outPath: String,
      cap: Int = 20, trainUpTo: Int = 250, valFrom: Int = 253,
      threshold: Double = 0.8): (DataFrame, Report) = {
    val docs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .withColumn("bucket", TextAnalysis.splitBucket(col("doc_id")))
    val nDocs = docs.count()

    // 1. DECONTAMINATION (the d10b screen): train-split docs sharing
    // 8-grams with the HELD-OUT slice are quarantined. The protected
    // material is everything past the train threshold — val (buckets in
    // [trainUpTo, valFrom)) AND test (>= valFrom) — so the gram state is
    // built from bucket >= trainUpTo, not just the test split.
    val st = Dedup.evalGramState(docs.filter(col("bucket") >= trainUpTo))
    val quarantined = Dedup.screenContamination(
      docs.filter(col("bucket") < trainUpTo), st.bloom, st.grams)
      .select(col("doc_id")).localCheckpoint()
    val nQuarantined = quarantined.count()
    val screened = docs.join(quarantined, Seq("doc_id"), "left_anti")

    // 2. EXACT DEDUP (d1): keep the min doc_id of each byte-identical
    // group — the digest aggregation ships (digest, id), never text
    val exactKeep = screened
      .groupBy(sha2(col("text"), 256).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exactDeduped = screened.join(exactKeep, Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val nAfterExact = exactDeduped.count()

    // 3. NEAR-DUP CANONICAL (d9 clusters + d19 keep rule) over the
    // survivors: one representative per near-dup cluster survives
    val canon = Dedup.canonicalOfLabelState(
      Dedup.labelStateOf(exactDeduped, threshold))
    val nearKept = exactDeduped.join(
      canon.filter(col("keep")).select(col("doc_id")), Seq("doc_id"), "left_semi")
      .localCheckpoint()
    val nAfterNear = nearKept.count()

    // 4. QUALITY GATE (t3's keep rule) — per-doc and stage-independent,
    // so the flag computed over the full table joins exactly
    val quality = TextAnalysis.qualityScore(spark, dir)
      .filter(col("keep")).select(col("doc_id"))
    val qualityKept = nearKept.join(quality, Seq("doc_id"), "left_semi")
    val nAfterQuality = qualityKept.count()

    // 5. PER-SOURCE CAP (t20's rule over the SURVIVORS — the cap is a
    // property of what remains, not of the raw corpus)
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val kept = qualityKept
      .withColumn("src_rank", row_number().over(wSrc))
      .filter(col("src_rank") <= cap)
      .drop("src_rank", "bucket")
      .localCheckpoint()
    val nKept = kept.count()

    // 6. WRITE the e1 layout
    graft.emit.CorpusWriter.write(kept, outPath)

    (kept, Report(
      nDocs = nDocs,
      nQuarantined = nQuarantined,
      nExactDupDropped = nDocs - nQuarantined - nAfterExact,
      nNearDupDropped = nAfterExact - nAfterNear,
      nQualityDropped = nAfterNear - nAfterQuality,
      nCapDropped = nAfterQuality - nKept,
      nKept = nKept))
  }

  /** The lifecycle a training run actually executes: [[run]]'s curate →
    * write, continued through SEQUENCE PACKING and the manifest — the
    * t23 family folded into the facade. The packing rides the SAME
    * placement core as the t24-gated dedup→pack composition
    * ([[TextAnalysis.packingOf]] — the two-level integer prefix sum)
    * and the manifest the same generator arithmetic as t23b
    * ([[TextAnalysis.manifestOf]]), so the composed path's correctness
    * is gated by their oracles; the pipeline adds only the composition
    * and the extended funnel report (PipelineSpec telescopes it through
    * placements). Returns (kept corpus, placements, manifest, report).
    */
  def runWithPacking(spark: SparkSession, dir: String, outPath: String,
      seqLen: Int = 2048, chunkDocs: Long = 4096, cap: Int = 20,
      trainUpTo: Int = 250, valFrom: Int = 253, threshold: Double = 0.8)
      : (DataFrame, DataFrame, DataFrame, PackedReport) = {
    val (kept, report) = run(spark, dir, outPath, cap, trainUpTo, valFrom,
      threshold)
    val placements = TextAnalysis.packingOf(
      kept.select(col("doc_id"),
        size(graft.functions.Exprs.tokens(col("text"))).cast("long")
          .as("n_tokens")),
      seqLen, chunkDocs).localCheckpoint()
    val manifest = TextAnalysis.manifestOf(placements, seqLen)
    val stats = placements.agg(
      count(lit(1)).as("n_placed"),
      coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
      coalesce(max(col("seq_last")) + 1L, lit(0L)).as("n_sequences")).head()
    (kept, placements, manifest, PackedReport(
      curation = report,
      nPlaced = stats.getAs[Long]("n_placed"),
      nTokens = stats.getAs[Long]("n_tokens"),
      nSequences = stats.getAs[Long]("n_sequences")))
  }

  /** The funnel report extended through the MIXTURE stages: of the kept
    * corpus, `nSampled` docs fill the per-lang token budgets (t25),
    * expand to `nReplicas` (doc, epoch) replicas (t26), and place
    * `nTokens` replica tokens into `nSequences` sequences (t26b's
    * composition) — every count telescoping from the last.
    */
  final case class MixedReport(
      curation: Report,
      nSampled: Long,
      nReplicas: Long,
      nTokens: Long,
      nSequences: Long)

  /** The MIXTURE-RECIPE lifecycle end to end: [[run]]'s curate → write,
    * continued through token-share sampling (t25), fractional-epoch
    * upsampling (t26) and replica packing (t26b) — what a run that
    * trains on a weighted blend of the curated corpus actually
    * executes. Every stage is the gate-checked operator core
    * ([[TextAnalysis.mixtureSampleOf]] / [[TextAnalysis.packUpsampledOf]]
    * — the SAME code paths t25/t26b's oracles gate), so the facade adds
    * only composition and the extended funnel report (PipelineSpec
    * telescopes it: sampled ⊆ kept and budget-prefix-exact, replica and
    * token conservation, placement contiguity).
    * Returns (kept corpus, replica placements, report).
    */
  def runWithMixture(spark: SparkSession, dir: String, outPath: String,
      mixWeightsPct: Map[String, Int] = Map("en" -> 40, "de" -> 15,
        "es" -> 15, "fr" -> 15, "zh" -> 15),
      mixTotalTokens: Long = 12000L,
      epochWeightsPct: Map[String, Int] = Map("en" -> 230, "de" -> 150,
        "es" -> 100, "fr" -> 100, "zh" -> 75),
      seqLen: Int = 2048, chunkDocs: Long = 4096, cap: Int = 20,
      trainUpTo: Int = 250, valFrom: Int = 253, threshold: Double = 0.8)
      : (DataFrame, DataFrame, MixedReport) = {
    val (kept, report) = run(spark, dir, outPath, cap, trainUpTo, valFrom,
      threshold)
    val toks = kept.select(col("doc_id"), col("lang"),
      size(graft.functions.Exprs.tokens(col("text"))).cast("long")
        .as("n_tokens"))
    val sampled = TextAnalysis
      .mixtureSampleOf(toks, mixWeightsPct, mixTotalTokens)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .localCheckpoint()
    val placements = TextAnalysis
      .packUpsampledOf(sampled, seqLen, chunkDocs, epochWeightsPct)
      .localCheckpoint()
    val stats = placements.agg(
      count(lit(1)).as("n_replicas"),
      coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
      coalesce(max(col("seq_last")) + 1L, lit(0L)).as("n_sequences")).head()
    (kept, placements, MixedReport(
      curation = report,
      nSampled = sampled.count(),
      nReplicas = stats.getAs[Long]("n_replicas"),
      nTokens = stats.getAs[Long]("n_tokens"),
      nSequences = stats.getAs[Long]("n_sequences")))
  }

  /** [[runWithMixture]] with the per-lang token budgets COMPUTED instead
    * of caller-supplied: the t22 Hamilton apportionment
    * ([[TextAnalysis.allocationOf]]) distributes `mixTotalTokens` across
    * the KEPT corpus's languages proportionally to their post-curation
    * token masses (Σ budgets == mixTotalTokens exactly), and the t25
    * greedy prefix fills those budgets — the t27-gated composition as a
    * lifecycle. Returns the budgets frame too, so a caller (and
    * PipelineSpec's telescoping check) can see the allocation the run
    * executed. Sampling, upsampling and packing are the same gate-checked
    * cores as [[runWithMixture]].
    */
  def runWithAllocatedMixture(spark: SparkSession, dir: String,
      outPath: String, mixTotalTokens: Long = 12000L,
      epochWeightsPct: Map[String, Int] = Map("en" -> 230, "de" -> 150,
        "es" -> 100, "fr" -> 100, "zh" -> 75),
      seqLen: Int = 2048, chunkDocs: Long = 4096, cap: Int = 20,
      trainUpTo: Int = 250, valFrom: Int = 253, threshold: Double = 0.8)
      : (DataFrame, DataFrame, DataFrame, MixedReport) = {
    val (kept, report) = run(spark, dir, outPath, cap, trainUpTo, valFrom,
      threshold)
    val toks = kept.select(col("doc_id"), col("lang"),
      size(graft.functions.Exprs.tokens(col("text"))).cast("long")
        .as("n_tokens"))
    val budgets = TextAnalysis.allocationOf(
        toks.groupBy(col("lang")).agg(sum(col("n_tokens")).as("toks")),
        Seq("lang"), mixTotalTokens)
      .select(col("lang"), col("alloc").as("budget"))
      .localCheckpoint()
    val sampled = TextAnalysis
      .mixtureSampleWithBudgets(toks, budgets)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .localCheckpoint()
    val placements = TextAnalysis
      .packUpsampledOf(sampled, seqLen, chunkDocs, epochWeightsPct)
      .localCheckpoint()
    val stats = placements.agg(
      count(lit(1)).as("n_replicas"),
      coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"),
      coalesce(max(col("seq_last")) + 1L, lit(0L)).as("n_sequences")).head()
    (kept, budgets, placements, MixedReport(
      curation = report,
      nSampled = sampled.count(),
      nReplicas = stats.getAs[Long]("n_replicas"),
      nTokens = stats.getAs[Long]("n_tokens"),
      nSequences = stats.getAs[Long]("n_sequences")))
  }
}
