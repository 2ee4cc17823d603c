package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference has no streams (SURVEY §2.12
  * — its closest mechanisms are mtime freshness gates and incremental
  * re-checksumming), so this is the engine's forward-looking stream path:
  * the `events` table replayed as a file stream → watermarked tumbling
  * windows → aggregates, exactly the batch Scalars.hourlyRollup restated
  * incrementally.
  *
  * At scale this is the standard continuous-ingest topology: file/queue
  * source, event-time watermark bounding state, windowed partial aggregates
  * maintained per key in the state store.
  */
object EventsStream {

  /** Hourly windowed counts/sums per event_type with a 1-hour watermark. */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame =
    eventSource(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Run the streaming query to completion over the static parquet (memory
    * sink, AvailableNow trigger) and return the materialized result — the
    * local-smoke harness recommended by the Spark guide.
    */
  def runToCompletion(spark: SparkSession, dir: String, name: String = "events_hourly"): DataFrame = {
    val q: StreamingQuery = hourlyAgg(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** The events file stream. File streams require a schema up front, but
    * hardcoding one bakes in a single `ts` encoding — the file has shipped
    * as nanos-Long, micros-NTZ and plain TIMESTAMP (see Tables.events).
    * Instead the schema comes from one batch-read of the same path (a
    * single footer resolution at stream definition), and the arrived type
    * goes through the same three-way normalization as the batch accessor,
    * so stream and batch agree on every encoding.
    */
  private[graft] def eventSource(spark: SparkSession, dir: String): DataFrame = {
    val arrivedSchema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.Tables.normalizeTs(spark.readStream
      .schema(arrivedSchema)
      // file streams need a directory source; glob-filter to the one table
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
  }

  /** Session windows per user (30-minute inactivity gap) — the builtin
    * `session_window` aggregation under a watermark; the Spark-first way to
    * sessionize before reaching for custom state.
    */
  def sessionAgg(spark: SparkSession, dir: String, gap: String = "30 minutes"): DataFrame =
    eventSource(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming dedup WITHIN the watermark horizon: drop repeated event_ids
    * across micro-batches with watermark-bounded state
    * (`dropDuplicatesWithinWatermark`) — the continuous-ingest twin of the
    * batch exact-dedup tier (Dedup.exactGroups). State holds one key per
    * event inside the horizon and is evicted as the watermark advances, so
    * a 100 TB/day stream keeps bounded state instead of an ever-growing
    * seen-set. The bound is the guarantee's limit too: a duplicate whose
    * occurrences are separated by more than the delay (and land in
    * different micro-batches) is NOT caught — global exactness needs the
    * batch tier over the settled data.
    */
  def dedupedEvents(spark: SparkSession, dir: String): DataFrame =
    eventSource(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run the streaming dedup to completion (memory sink, AvailableNow). */
  def runDedupToCompletion(spark: SparkSession, dir: String,
      name: String = "events_dedup"): DataFrame = {
    val q: StreamingQuery = dedupedEvents(spark, dir).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Stream-stream INTERVAL join — the continuous twin of the batch range
    * join (Library.rangeJoinCounts): each click pairs with the same user's
    * views from the preceding `reachMinutes`. Both sides carry watermarks
    * and the join condition bounds event-time distance, so the state store
    * holds only rows inside the horizon and evicts as the watermark
    * advances — the canonical bounded-state stream-stream topology. At
    * scale both streams shuffle on user_id once and the per-key state is
    * bounded by per-user event density in one reach window.
    */
  def clickViewJoin(spark: SparkSession, dir: String,
      reachMinutes: Int = 10): DataFrame = {
    val views = eventSource(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"), col("value").as("view_value"))
      .withWatermark("view_ts", "1 hour")
    val clicks = eventSource(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    clicks.join(views, expr(
      s"c_user = v_user AND view_ts BETWEEN click_ts - INTERVAL $reachMinutes MINUTES AND click_ts"))
      .select(col("click_id"), col("view_id"), col("c_user").as("user_id"),
        col("click_ts"), col("view_ts"), col("view_value"))
  }

  /** Run the stream-stream join to completion (memory sink, AvailableNow). */
  def runJoinToCompletion(spark: SparkSession, dir: String,
      name: String = "events_join"): DataFrame = {
    val q: StreamingQuery = clickViewJoin(spark, dir).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class OpenSession(start: Long, end: Long, n_events: Long)
  final case class PendingSessions(sessions: Seq[OpenSession])
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

  /** Custom sessionization via flatMapGroupsWithState — the state surface
    * for session logic `session_window` can't express (e.g. enriching a
    * session from accumulated state as it closes). Each invocation may
    * emit 0..N CLOSED sessions for the group (hence flatMap, not map).
    *
    * Correctness under out-of-order arrival: state holds the LIST of
    * pending sessions inside the watermark horizon (sorted, disjoint
    * intervals). Each event merges into that list interval-wise — it can
    * extend a session backward, bridge two neighbors, or open a new one —
    * and a session is emitted only once the watermark passes
    * `end + gap`, when no admissible event can still touch it (the same
    * finality rule session_window applies). Emission happens on whichever
    * comes first: the next batch touching the group, or the event-time
    * timeout set to the earliest pending close. State per user is bounded
    * by the sessions inside one watermark horizon, independent of stream
    * history; per-invocation sorting is over ONE user's events in ONE
    * micro-batch.
    */
  def sessionizeFlat(events: org.apache.spark.sql.Dataset[TimedEvent],
      gapMs: Long = 30L * 60 * 1000): org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._

    // merge one event time into the sorted disjoint session list: absorbs
    // every session within gap reach of t (possibly two, when t bridges)
    def insert(ss: Vector[OpenSession], t: Long): Vector[OpenSession] = {
      val (before, rest) = ss.span(_.end < t - gapMs)
      val (mergeable, after) = rest.span(_.start <= t + gapMs)
      val merged =
        if (mergeable.isEmpty) OpenSession(t, t, 1L)
        else OpenSession(math.min(mergeable.head.start, t),
          math.max(mergeable.last.end, t), mergeable.map(_.n_events).sum + 1L)
      (before :+ merged) ++ after
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[TimedEvent], state: GroupState[PendingSessions]) =>
          val existing = state.getOption.map(_.sessions.toVector).getOrElse(Vector.empty)
          val merged = it.map(_.ts.getTime).toArray.sorted.foldLeft(existing)(insert)
          // final = watermark passed end + gap: no admissible event can
          // still extend or bridge into this session
          val wm = state.getCurrentWatermarkMs()
          val (ripe, open) = merged.partition(s => s.end + gapMs <= wm)
          if (open.nonEmpty) {
            state.update(PendingSessions(open))
            // earliest pending close; > wm by construction of `open`
            state.setTimeoutTimestamp(open.map(_.end).min + gapMs)
          } else state.remove()
          ripe.iterator.map(s => ClosedSession(uid, new java.sql.Timestamp(s.start),
            new java.sql.Timestamp(s.end), s.n_events))
      }
  }

  /** Custom arbitrary state via mapGroupsWithState: per-user running
    * totals maintained in the state store across micro-batches — the
    * KeyValueGroupedDataset state surface for logic session_window can't
    * express.
    */
  def statefulTotals(spark: SparkSession, dir: String, name: String = "events_state"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ds = eventSource(spark, dir)
      .select(col("user_id"), col("value")).as[UserEvent]
    val updated = ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          val next = events.foldLeft(prev)((acc, e) =>
            UserTotals(uid, acc.n_events + 1, acc.sum_value + e.value))
          state.update(next)
          next
      }
    val q = updated.toDF().writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Document-stream source: a directory of parquet shards replayed as a
    * file stream, with a synthetic per-document event time (id-derived —
    * deterministic across replays) for watermark-bounded dedup state.
    */
  val documentSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private[graft] def documentSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(documentSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(col("doc_id") * 1000000L))

  /** STREAMING delta near-dup — [[graft.operators.Dedup.deltaNearDups]]
    * (d13) restated as the continuous-ingest topology: each arriving
    * document derives its shingles + minhash band keys MAP-SIDE, then
    * stream-STATIC-joins the persisted band index (stateless — the static
    * side is the join's build input) and verifies true Jaccard against
    * the static shingle table. A pair matched by several bands (and any
    * replayed shard file) collapses through
    * `dropDuplicatesWithinWatermark` keyed on the id pair —
    * watermark-bounded state standing in for d13's batch `distinct`.
    * Pairs among documents arriving together (both sides new) are
    * invisible to this topology by design — they'd need a stream-stream
    * self-join — and settle at the next batch index upsert, the same
    * incremental-then-batch split as the reference's mtime-memo dedup.
    */
  def deltaNearDupStream(newDocs: DataFrame,
      index: graft.operators.Dedup.NearDupIndex,
      threshold: Double = 0.8): DataFrame = {
    val withSh = newDocs
      .withWatermark("ts", "1 hour")
      .select(col("doc_id"), col("ts"),
        graft.plans.ShinglesExpr.wordShingles(col("text"), 3).as("sh"))
      .withColumn("dsh_n", array_distinct(col("sh")))
    val banded = graft.operators.Dedup.bandedKeys(
      withSh, index.bands, index.rowsPerBand, carry = Seq("ts", "dsh_n"))
    val candidates = banded
      .join(index.banded.select(col("band"), col("bkey"), col("doc_id").as("id_o")),
        Seq("band", "bkey"))
      .select(col("doc_id").as("id_n"), col("id_o"), col("ts"), col("dsh_n"))
      .dropDuplicatesWithinWatermark("id_n", "id_o")
    val indexedSets = index.shingles
      .select(col("doc_id").as("id_o"), array_distinct(col("sh")).as("dsh_o"))
    candidates.join(indexedSets, Seq("id_o"))
      .withColumn("inter", size(array_intersect(col("dsh_n"), col("dsh_o"))))
      .withColumn("uni", size(array_union(col("dsh_n"), col("dsh_o"))))
      .withColumn("jaccard", round(col("inter").cast("double") / col("uni"), 4))
      .filter(col("jaccard") >= threshold)
      .select(least(col("id_n"), col("id_o")).as("id_a"),
        greatest(col("id_n"), col("id_o")).as("id_b"), col("jaccard"))
  }

  /** CONTINUOUS INGEST — the full production loop under `foreachBatch`,
    * closing the gap the stream-static twins document (intra-batch pairs
    * "settle at the next batch index upsert" — here that upsert IS the
    * stream): per micro-batch,
    *
    *   1. drop documents whose ids are already indexed — one doc_id
    *      anti-join against the index's bucketed shingle table, so
    *      at-least-once delivery of a shard degrades to exactly-once
    *      output (id-keyed idempotence, the upsert contract enforced
    *      rather than assumed);
    *   2. report the batch's verified delta pairs against the index AS OF
    *      the batch start — the full two-leg BATCH delta
    *      ([[graft.operators.Dedup.deltaNearDups]]), so intra-batch pairs
    *      are visible, unlike the stream-static topology;
    *   3. append the batch into the persisted bucketed index tables
    *      ([[graft.operators.Dedup.appendNearDupIndex]]).
    *
    * Batches run sequentially (Structured Streaming's contract), so a
    * pair (a, b) with a arriving in batch i and b in batch j > i is
    * emitted exactly once — by batch j's vs-index leg; same-batch pairs
    * by the self-join leg. The union of emissions over ANY delivery
    * order/replay therefore equals the one-shot batch delta of all new
    * documents against the starting index (StreamingSpec asserts both
    * the identity and zero duplicate emissions). Periodic
    * [[graft.operators.Dedup.compactNearDupIndex]] keeps the append-only
    * index's buckets single-file (sorted reads); the pairs land in an
    * append-only `<name>_pairs` table.
    */
  def runIngestNearDup(spark: SparkSession, shardDir: String,
      indexName: String, threshold: Double = 0.8,
      name: String = "ingest_neardup", maxFilesPerTrigger: Int = 1,
      takedownLog: String = "takedown_log"): DataFrame = {
    import graft.operators.Dedup
    Dedup.dropTableAndLocation(spark, s"${name}_pairs")
    val src = spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the previous batch APPENDED to these tables — drop any cached
        // relation/file listing so this batch reads the grown index (the
        // session catalog caches resolved data-source relations; without
        // the refresh every batch can see the index as of stream start)
        spark.catalog.refreshTable(s"${indexName}_shingles")
        spark.catalog.refreshTable(s"${indexName}_banded")
        // localCheckpoint freezes the filtered batch BEFORE the index
        // tables mutate under it: the anti-join reads _shingles, and
        // appending to a table that appears in the write's own lineage
        // is both racy and rejected by the writer
        val fresh = batch
          .join(spark.table(s"${indexName}_shingles").select("doc_id"),
            Seq("doc_id"), "left_anti")
          .localCheckpoint()
        if (!fresh.isEmpty) {
          Dedup.deltaNearDups(fresh, Dedup.loadNearDupIndex(spark, indexName),
              threshold)
            .write.mode("append").saveAsTable(s"${name}_pairs")
          Dedup.appendNearDupIndex(spark, indexName, fresh)
          // a RE-INGESTED doc must also drop out of the cumulative
          // takedown log, or every later sketch-cell rebuild of its lang
          // permanently excludes it (the per-index tombstones clear on
          // re-append; only the log-reading rebuild needs this hook) —
          // no-op when no takedown estate is deployed
          graft.operators.Takedown.clearTakedownLog(spark,
            fresh.select(col("doc_id")), takedownLog)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(s"${name}_pairs")
  }

  /** CONTINUOUS CURATION — [[runIngestNearDup]]'s loop extended through
    * the curation tail (d16 + d19b under true ingest): per micro-batch,
    *
    *   1. drop already-indexed ids (idempotence under at-least-once
    *      delivery — anti-join keyed on BOTH the shingles index and the
    *      quarantine log, since screened-out docs never reach the index);
    *   1b. (with `screen`) DECONTAMINATE AT INGEST — the d10b Bloom
    *      screen as a curation stage: arriving docs' k-grams are bloom-
    *      pre-filtered map-side against the frozen eval sketch, suspects
    *      verified exactly against the eval gram digests
    *      ([[graft.operators.Dedup.screenContamination]]), and
    *      contaminated docs land in the append-only `<name>_quarantine`
    *      table (with their shared-gram stats + batch id) instead of the
    *      pair search, the label state, or the index — the production
    *      placement of decontamination: before anything else sees the
    *      document;
    *   2. compute the batch's verified delta pairs against the index AS
    *      OF batch start ([[graft.operators.Dedup.deltaNearDups]] — both
    *      legs, so intra-batch pairs merge too);
    *   3. merge them into the persisted label state
    *      ([[graft.operators.Dedup.mergeLabelState]] — compute bounded
    *      by touched clusters, never the corpus);
    *   4. append the CHANGED label slice (+ batch id) to
    *      `<name>_label_updates` — the delta-sized write a production
    *      row-level store ingests — and swap the materialized full label
    *      table ([[graft.operators.Dedup.applyLabelUpdates]]);
    *   5. append the batch into the near-dup index.
    *
    * Because batches run sequentially and every cross-batch pair is
    * found through the index by the later batch, the final label table
    * equals the one-shot batch clustering of (base ∪ all shards) —
    * StreamingSpec asserts that identity, the canonical (d19b window)
    * identity on top of it, and that latest-wins replay of the updates
    * log alone reconstructs the same state. Caller initializes
    * `<name>_labels` via [[graft.operators.Dedup.saveLabelState]] over
    * the base state and the index via saveNearDupIndex — the same
    * prior-state contract as the batch gates.
    */
  def runIngestCuration(spark: SparkSession, shardDir: String,
      indexName: String, threshold: Double = 0.8,
      name: String = "ingest_curation", maxFilesPerTrigger: Int = 1,
      screen: Option[graft.operators.Dedup.EvalGramState] = None,
      takedownLog: String = "takedown_log"): DataFrame = {
    import graft.operators.Dedup
    Dedup.dropTableAndLocation(spark, s"${name}_label_updates")
    Dedup.dropTableAndLocation(spark, s"${name}_quarantine")
    val src = spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        spark.catalog.refreshTable(s"${indexName}_shingles")
        spark.catalog.refreshTable(s"${indexName}_banded")
        spark.catalog.refreshTable(s"${name}_labels")
        // idempotence is keyed on BOTH persisted stores: the shingles
        // index (clean docs) and the quarantine log (screened-out docs
        // never reach the index, so without this leg a replayed shard
        // would re-screen and re-log them)
        val quarantineTable = s"${name}_quarantine"
        val alreadyIn = if (spark.catalog.tableExists(quarantineTable))
          spark.table(s"${indexName}_shingles").select("doc_id")
            .unionByName(spark.table(quarantineTable).select("doc_id"))
        else spark.table(s"${indexName}_shingles").select("doc_id")
        val arrived = batch
          .join(alreadyIn, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        // DECONTAMINATION AT INGEST (the d10b screen as a curation
        // stage): gram-hash the arriving docs map-side against the
        // frozen eval bloom, verify suspects exactly, quarantine
        // contaminated docs — they never enter the pair search, the
        // label state, or the index
        val fresh = screen match {
          case None => arrived
          case Some(st) =>
            val contaminated = Dedup.screenContamination(arrived,
              st.bloom, st.grams).localCheckpoint()
            if (!contaminated.isEmpty) {
              contaminated.withColumn("batch_id", lit(batchId))
                .write.mode("append").saveAsTable(quarantineTable)
              arrived.join(contaminated.select("doc_id"),
                Seq("doc_id"), "left_anti").localCheckpoint()
            } else arrived
        }
        if (!fresh.isEmpty) {
          // freeze the prior state: the generation swap below drops the
          // table this batch's merge reads
          val labels = spark.table(s"${name}_labels").localCheckpoint()
          val delta = Dedup.deltaNearDups(fresh,
            Dedup.loadNearDupIndex(spark, indexName), threshold)
          val newDocs = fresh.select(col("doc_id"),
            length(coalesce(col("text"), lit(""))).as("qlen"))
          val changed = Dedup.mergeLabelState(spark, labels, delta, newDocs)
            .localCheckpoint()
          // the log is appended BEFORE the table swap / index append (a
          // crash after the swap but before a log write would lose the
          // slice forever — replay would skip the batch via the shingles
          // anti-join). The cost is at-least-once LOG semantics: a crash
          // after this append refires the batch under the SAME batch_id,
          // so skip the re-append when that id is already logged — the
          // recomputed slice converges to the same rows and the log stays
          // delta-sized instead of accumulating duplicates.
          val logTable = s"${name}_label_updates"
          val alreadyLogged = spark.catalog.tableExists(logTable) &&
            !spark.table(logTable).filter(col("batch_id") === batchId).isEmpty
          if (!alreadyLogged)
            changed.withColumn("batch_id", lit(batchId))
              .write.mode("append").saveAsTable(logTable)
          Dedup.applyLabelUpdates(spark, s"${name}_labels", changed)
          Dedup.appendNearDupIndex(spark, indexName, fresh)
          // re-ingested docs drop out of the cumulative takedown log
          // (see runIngestNearDup — the log-reading sketch rebuild is
          // the one consumer the per-index tombstone lift doesn't cover)
          graft.operators.Takedown.clearTakedownLog(spark,
            fresh.select(col("doc_id")), takedownLog)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(s"${name}_labels")
  }

  /** CONTINUOUS MONITOR→ACTION — the d43/d57 reband loop's STREAMING
    * member (round-17 verdict ask #3: a monitor→action loop that fires
    * from ingest instead of a one-shot gate). A stream of document
    * shards maintains a persisted minhash banded generation; per
    * micro-batch:
    *
    *   1. drop already-indexed ids (anti-join on the `_shingles`
    *      companion — idempotence under at-least-once delivery: a
    *      replayed shard appends nothing and touches nothing);
    *   2. append the batch's shingles + banded keys UNDER THE BANDING
    *      THE META RECORDS ([[graft.operators.Dedup
    *      .appendMinhashRebandState]] — the round-17 contract: an
    *      append can never band under drifted parameters);
    *   3. MONITOR: measure the persisted generation's recall over the
    *      bounded audit set ([[graft.operators.Dedup
    *      .minhashServingRecall]] — the audit is the retained corpus
    *      restricted by `auditFilter` AND capped at `auditCap` non-probe
    *      docs by [[boundedAudit]]: the default filter is a md5-bucket
    *      FRACTION of the corpus, which alone would let the quadratic
    *      exact side grow with ingest — the cap makes the audit a true
    *      fixed-size set at any corpus size, and negative probe ids
    *      always ride);
    *   4. ACTION on a miss: re-band the WHOLE retained corpus 3×3 →
    *      9×1 as a complete `__gen` generation and swap meta-last —
    *      the crash-tested [[graft.operators.Dedup
    *      .swapInBandedGeneration]] verbatim; entry recovery runs at
    *      stream start (the lifecycle-ENTRY rule).
    *
    * Because the reband rebuilds from ALL retained shingles, the final
    * generation equals [[graft.operators.Dedup.minhashRebandLifecycle]]
    * run one-shot over (base ∪ all shards) — StreamingSpec asserts that
    * identity (the shared-oracle d18 pattern: d43's oracle already
    * gates the lifecycle, so the stream needs no oracle of its own) and
    * that replaying a delivered shard is a state no-op. Caller
    * initializes via [[graft.operators.Dedup.initMinhashRebandState]]
    * over the base corpus — the same prior-state contract as
    * [[runIngestCuration]].
    */
  def runIngestRebandLoop(spark: SparkSession, shardDir: String,
      name: String, threshold: Double = 0.8, target: Double = 0.95,
      auditFilter: Column = graft.operators.TextAnalysis.splitBucket(
        col("doc_id")) < 64 || col("doc_id") < 0,
      maxFilesPerTrigger: Int = 1, auditCap: Int = 1 << 17): DataFrame = {
    import graft.operators.Dedup
    // crash hygiene at lifecycle ENTRY (the simhashRebandLifecycle rule):
    // finish or discard a swap a prior process died inside before any
    // batch reads the serving generation
    Dedup.recoverBandedGenerationSwap(spark, name)
    val src = spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        rebandBatchStep(spark, name, batch, threshold, target,
          auditFilter, auditCap)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.catalog.refreshTable(s"${name}_banded")
    spark.table(s"${name}_banded")
  }

  /** Bound a monitor's audit frame to at most `cap` non-probe docs:
    * planted probes (negative ids) always ride; the rest rank by
    * md5(doc_id) (deterministic, engine-portable — never rand) and keep
    * the lowest `cap` via sort+limit, which Spark plans as
    * TakeOrderedAndProject (per-partition bounded top-k, then a
    * cap-row merge — no full shuffle). The ADVICE-18 fix: the default
    * `auditFilter` is a md5-bucket FRACTION of the retained corpus, and
    * a fraction is not a bound — the monitor's quadratic exact side
    * would grow with ingest. With the cap it is O(cap²) forever.
    *
    * The DEFAULT cap (2^17 ≈ 131k ids) is derived from a PAIR budget,
    * not a row count (the r19 right-sizing): the exact side audits
    * ≤ cap²/2 candidate pairs, so 2^17 ids ⇒ ≤ 2^33 ≈ 8.6B pairs per
    * micro-batch — generous for a distributed audit but bounded at a
    * price a deployment could actually pay per batch, where the old
    * 1M-id default encoded "never reached at test SF" (5×10¹¹ pairs —
    * a number nobody would knowingly schedule). Test corpora sit far
    * below either value, so behavior is unchanged; at 100 TB the cap
    * is the dial and its default is now a defensible price.
    */
  private def boundedAudit(df: DataFrame, cap: Int,
      idCol: String = "doc_id"): DataFrame =
    if (cap <= 0) df
    else df.filter(col(idCol) < 0).unionByName(
      df.filter(col(idCol) >= 0)
        .orderBy(md5(col(idCol).cast("string")), col(idCol))
        .limit(cap))

  /** One micro-batch's monitor→action step for a minhash reband state
    * (ONE definition — the fleet loop and the tenant loop both run
    * exactly this body per state, so the two can never drift on a dial
    * change; the fleet loop is the one-state case): anti-join the
    * slice's fresh ids, append under the meta's banding, measure the
    * persisted generation's recall over the bounded audit set, and
    * re-band 9×1 on a miss unless the generation already serves 9×1.
    */
  private def rebandBatchStep(spark: SparkSession, name: String,
      slice: DataFrame, threshold: Double, target: Double,
      auditFilter: Column, auditCap: Int): Unit = {
    import graft.operators.Dedup
    spark.catalog.refreshTable(s"${name}_shingles")
    val fresh = slice
      .join(spark.table(s"${name}_shingles").select("doc_id"),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (!fresh.isEmpty) {
      Dedup.appendMinhashRebandState(spark, name,
        Dedup.shingleTableOf(fresh).localCheckpoint())
      spark.catalog.refreshTable(s"${name}_shingles")
      val audit = boundedAudit(
        spark.table(s"${name}_shingles").filter(auditFilter), auditCap)
      val row = Dedup.minhashServingRecall(spark, name, audit,
        threshold).head()
      // the action is a no-op once the generation already serves the
      // re-banding (9x1 is this loop's whole dial) — without the
      // guard, a corpus whose 9x1 recall still misses the target
      // would rebuild the FULL retained corpus on every later batch
      val m = spark.table(s"${name}_meta").head()
      val already9x1 = m.getAs[Int]("bands") == 9 &&
        m.getAs[Int]("rows_per_band") == 1
      if (row.getAs[Double]("recall") < target && !already9x1)
        Dedup.rebandMinhashGenerationFromShingles(spark, name,
          bands = 9, rowsPerBand = 1)
    }
  }

  /** The tenants a micro-batch actually carries rows for (distinct pmod
    * over the batch — a batch-sized aggregation collecting ≤ nTenants
    * ints): the per-tenant loops iterate THIS set, not 0 until nTenants
    * (the round-18 verdict nit — at hundreds of tenants, a sequential
    * anti-join + isEmpty per untouched tenant is 2N catalog reads per
    * batch for nothing).
    */
  private def touchedTenants(batch: DataFrame, nTenants: Int,
      idCol: String = "doc_id"): Seq[Int] =
    batch.select(pmod(col(idCol), lit(nTenants)).cast("int").as("tn"))
      .distinct().collect().map(_.getInt(0)).sorted.toSeq

  /** [[runIngestRebandLoop]]'s TENANT-SCOPED member — the d57/d62
    * table-pair layout driven from ingest (the tenant composition of
    * round 18's three monitor asks): each tenant's banded generation is
    * its own `${namePrefix}_t$tn` table pair, a micro-batch fans its
    * rows to their tenants' states (pmod — the estate-sync tenancy), and
    * each tenant's monitor→action evaluates INDEPENDENTLY per batch: a
    * shard full of one tenant's misses rebands that tenant's generation
    * alone, the other tenants' tables never move (their batch slice
    * anti-joins empty, their monitor never re-fires — the structural
    * isolation the table-pair layout buys). Entry recovery runs per
    * tenant at stream start. Caller initializes each tenant's state via
    * [[graft.operators.Dedup.initMinhashRebandState]] over the tenant's
    * base slice. StreamingSpec proves: the streamed tenant's final
    * generation == its per-tenant batch lifecycle, the untouched
    * tenant's generation content-identical to init, replay a no-op.
    */
  def runTenantIngestRebandLoop(spark: SparkSession, shardDir: String,
      namePrefix: String, nTenants: Int = 2, threshold: Double = 0.8,
      target: Double = 0.95,
      auditFilter: Column = graft.operators.TextAnalysis.splitBucket(
        col("doc_id")) < 64 || col("doc_id") < 0,
      maxFilesPerTrigger: Int = 1, auditCap: Int = 1 << 17): Unit = {
    import graft.operators.Dedup
    (0 until nTenants).foreach(tn =>
      Dedup.recoverBandedGenerationSwap(spark, s"${namePrefix}_t$tn"))
    val src = spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.localCheckpoint()
        // only the tenants this batch carries rows for — an untouched
        // tenant's state is never opened (its slice would anti-join to
        // empty anyway; deriving the set first skips the catalog reads)
        for (tn <- touchedTenants(b, nTenants))
          rebandBatchStep(spark, s"${namePrefix}_t$tn",
            b.filter(pmod(col("doc_id"), lit(nTenants)) === tn),
            threshold, target, auditFilter, auditCap)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** [[runIngestRebandLoop]]'s WINNOWING-family member — the d55b
    * monitor→action loop driven from ingest: a stream of document
    * shards maintains a persisted winnowed-fingerprint generation (plus
    * its `_docs` companion — fingerprints are not invertible, so the
    * retune action re-fingerprints from retained texts). Per
    * micro-batch: per-table idempotent appends UNDER THE META'S
    * (w, winnow), then the detection monitor over the bounded audit set
    * ([[graft.operators.Dedup.winnowServingDetection]] — exact side
    * from the audit texts' full digest sets, candidate side
    * audit-restricted BEFORE the df census), and on a miss the
    * re-winnow at 2 through the crash-tested meta-last swap (skipped
    * once the generation already serves winnow 2 — the reband loop's
    * guard). Entry recovery at stream start. StreamingSpec proves the
    * final generation equals [[graft.operators.Dedup
    * .winnowRetuneLifecycle]] one-shot over (base ∪ shards) and that a
    * replayed shard is a state no-op — the shared-oracle d18 pattern
    * (d55b's oracle already gates the lifecycle).
    */
  def runIngestWinnowRetuneLoop(spark: SparkSession, shardDir: String,
      name: String, target: Double = 0.95, threshold: Double = 0.9,
      auditFilter: Column = graft.operators.TextAnalysis.splitBucket(
        col("doc_id")) < 64 || col("doc_id") < 0,
      maxFilesPerTrigger: Int = 1, auditCap: Int = 1 << 17): DataFrame = {
    import graft.operators.Dedup
    Dedup.recoverBandedGenerationSwap(spark, name)
    val src = spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        winnowBatchStep(spark, name, batch, target, threshold,
          auditFilter, auditCap)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.catalog.refreshTable(s"${name}_banded")
    spark.table(s"${name}_banded")
  }

  /** One micro-batch's monitor→action step for a winnow-retune state —
    * the [[rebandBatchStep]] shape for the winnowing dial (one
    * definition, fleet and tenant members): anti-join the slice's fresh
    * ids, append texts + fingerprints under the meta's (w, winnow),
    * measure the persisted generation's detection over the bounded
    * audit set, and re-winnow at 2 on a miss unless the generation
    * already serves winnow 2.
    */
  private def winnowBatchStep(spark: SparkSession, name: String,
      slice: DataFrame, target: Double, threshold: Double,
      auditFilter: Column, auditCap: Int): Unit = {
    import graft.operators.Dedup
    spark.catalog.refreshTable(s"${name}_docs")
    val fresh = slice
      .join(spark.table(s"${name}_docs").select("doc_id"),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (!fresh.isEmpty) {
      Dedup.appendWinnowRetuneState(spark, name, fresh)
      spark.catalog.refreshTable(s"${name}_docs")
      val audit = boundedAudit(
        spark.table(s"${name}_docs").filter(auditFilter), auditCap)
      val row = Dedup.winnowServingDetection(spark, name, audit,
        threshold).head()
      val winnow = spark.table(s"${name}_meta").head()
        .getAs[Int]("winnow")
      if (row.getAs[Double]("detection") < target && winnow != 2)
        Dedup.rewinnowGenerationFromDocs(spark, name, newWinnow = 2)
    }
  }

  /** [[runIngestWinnowRetuneLoop]]'s TENANT-SCOPED member (round-18
    * verdict ask #2 — the winnow family's batch action was already
    * tenant-scoped in d61, but a tenant whose short-doc skew arrives
    * via ingest could not retune from the stream): each tenant's
    * winnowed fingerprint generation + `_docs` companion is its own
    * `${namePrefix}_t$tn` table pair (the d61 layout), a micro-batch
    * fans its rows to their tenants' states (pmod — the estate-sync
    * tenancy, restricted to the batch's touched-tenant set first), and
    * each touched tenant runs [[winnowBatchStep]] independently: a
    * shard full of one tenant's short-doc misses retunes that tenant's
    * winnow alone, every other tenant's tables (and their meta's
    * winnow) never move. Entry recovery runs per tenant at stream
    * start. Caller initializes each tenant's state via
    * [[graft.operators.Dedup.initWinnowRetuneState]] over the tenant's
    * base slice. StreamingSpec proves: the streamed tenant's final
    * generation == its per-tenant batch lifecycle
    * ([[graft.operators.Dedup.winnowRetuneLifecycle]] over
    * base ∪ shard — the shared-oracle d18 pattern, d61's oracle already
    * gates the lifecycle), the untouched tenant's generation
    * content-identical to init, replay a no-op.
    */
  def runTenantIngestWinnowRetuneLoop(spark: SparkSession, shardDir: String,
      namePrefix: String, nTenants: Int = 2, target: Double = 0.95,
      threshold: Double = 0.9,
      auditFilter: Column = graft.operators.TextAnalysis.splitBucket(
        col("doc_id")) < 64 || col("doc_id") < 0,
      maxFilesPerTrigger: Int = 1, auditCap: Int = 1 << 17): Unit = {
    import graft.operators.Dedup
    (0 until nTenants).foreach(tn =>
      Dedup.recoverBandedGenerationSwap(spark, s"${namePrefix}_t$tn"))
    val src = spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.localCheckpoint()
        for (tn <- touchedTenants(b, nTenants))
          winnowBatchStep(spark, s"${namePrefix}_t$tn",
            b.filter(pmod(col("doc_id"), lit(nTenants)) === tn),
            target, threshold, auditFilter, auditCap)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** [[runIngestRebandLoop]]'s SIMHASH-family member, completing the
    * monitor→action matrix: every looped family (minhash reband,
    * winnow retune, ANN re-bucket, simhash reband) now has batch fleet
    * + batch tenant + STREAMING fleet + streaming tenant members. A
    * stream of document shards maintains a persisted 4×16-bit simhash
    * banded generation — ONE table, no companion (the banded rows
    * carry the signature, so the re-band action rebuilds from retained
    * rows' distinct (doc_id, simhash) and idempotence is one
    * anti-join). Per micro-batch: signatures compute MAP-SIDE
    * ([[graft.operators.Dedup.simhash64Of]]), band under the meta's
    * bands, then the d28 recall monitor over the bounded audit set
    * ([[graft.operators.Dedup.simhashServingRecall]] — serving rows
    * audit-restricted BEFORE pair generation), and on a miss the
    * re-band at the radius-exact 8×8-bit tier through the crash-tested
    * meta-last swap (skipped once already 8-band). Entry recovery at
    * stream start. StreamingSpec proves the final generation equals
    * [[graft.operators.Dedup.simhashRebandLifecycle]] one-shot over
    * (base ∪ shards) — the d18 shared-oracle pattern (d32/d62's
    * oracles gate the lifecycle) — and replay is a state no-op. The
    * sf0.001 trigger is NATURAL: the fleet corpus measures 0.9048 at 4
    * bands / radius 5 (38 of 42 exact pairs caught), below the 0.95
    * target.
    */
  def runIngestSimhashRebandLoop(spark: SparkSession, shardDir: String,
      name: String, radius: Int = 5, target: Double = 0.95,
      auditFilter: Column = graft.operators.TextAnalysis.splitBucket(
        col("doc_id")) < 64 || col("doc_id") < 0,
      maxFilesPerTrigger: Int = 1, auditCap: Int = 1 << 17): DataFrame = {
    import graft.operators.Dedup
    Dedup.recoverBandedGenerationSwap(spark, name)
    val src = spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        simhashRebandBatchStep(spark, name,
          graft.operators.Dedup.simhash64Of(batch), radius, target,
          auditFilter, auditCap)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.catalog.refreshTable(s"${name}_banded")
    spark.table(s"${name}_banded")
  }

  /** [[runIngestSimhashRebandLoop]]'s TENANT-SCOPED member — d62's
    * table-pair layout driven from ingest: micro-batches fan to their
    * tenants' (banded, meta) pairs (pmod tenancy, restricted to the
    * batch's touched-tenant set first), each touched tenant runs the
    * shared batch step independently — the tripped tenant re-bands to
    * the radius-exact 8×8 tier alone, every other tenant's generation
    * (and its meta's bands) never moves. Entry recovery per tenant at
    * stream start; caller initializes each tenant's state over its
    * base signature slice via [[graft.operators.Dedup
    * .initSimhashRebandState]].
    */
  def runTenantIngestSimhashRebandLoop(spark: SparkSession,
      shardDir: String, namePrefix: String, nTenants: Int = 2,
      radius: Int = 5, target: Double = 0.95,
      auditFilter: Column = graft.operators.TextAnalysis.splitBucket(
        col("doc_id")) < 64 || col("doc_id") < 0,
      maxFilesPerTrigger: Int = 1, auditCap: Int = 1 << 17): Unit = {
    import graft.operators.Dedup
    (0 until nTenants).foreach(tn =>
      Dedup.recoverBandedGenerationSwap(spark, s"${namePrefix}_t$tn"))
    val src = spark.readStream
      .schema(documentSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = graft.operators.Dedup.simhash64Of(batch).localCheckpoint()
        for (tn <- touchedTenants(b, nTenants))
          simhashRebandBatchStep(spark, s"${namePrefix}_t$tn",
            b.filter(pmod(col("doc_id"), lit(nTenants)) === tn),
            radius, target, auditFilter, auditCap)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One micro-batch's monitor→action step for a simhash reband state
    * (ONE definition — fleet and tenant loops).
    */
  private def simhashRebandBatchStep(spark: SparkSession, name: String,
      slice: DataFrame, radius: Int, target: Double, auditFilter: Column,
      auditCap: Int): Unit = {
    import graft.operators.Dedup
    spark.catalog.refreshTable(s"${name}_banded")
    val fresh = slice
      .join(spark.table(s"${name}_banded").select("doc_id").distinct(),
        Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (!fresh.isEmpty) {
      Dedup.appendSimhashRebandState(spark, name, fresh)
      val audit = boundedAudit(
        Dedup.retainedSimhashSigs(spark, name).filter(auditFilter),
        auditCap)
      val row = Dedup.simhashServingRecall(spark, name, audit, radius)
        .head()
      // skip the action once the generation already serves the
      // radius-exact 8-band tier (the reband loop's guard)
      val bands = spark.table(s"${name}_meta").head().getAs[Int]("bands")
      if (row.getAs[Double]("recall") < target && bands != 8)
        Dedup.rebandSimhashGenerationFromState(spark, name, bands = 8)
    }
  }

  /** [[runIngestRebandLoop]]'s ANN-family member — the s23 re-bucket
    * loop driven from ingest (completing the batch + streaming + tenant
    * symmetry for the vector store's repair action): a stream of
    * embedding shards maintains a persisted LSH bucket generation plus
    * its `_vecs` companion (the re-bucket re-hashes retained vectors).
    * Per micro-batch: per-table idempotent appends UNDER THE META'S
    * planes, then the recall monitor over the bounded audit set
    * ([[graft.operators.Similarity.annServingBucketRecall]] — the ONE
    * monitor definition the s23 lifecycle also reads; serving buckets
    * audit-restricted BEFORE the bucket join, probes sort+limit), and
    * on a miss the re-bucket at `planes1` through the crash-tested
    * meta-last swap (skipped once the generation already serves
    * `planes1` — the reband loop's guard). Entry recovery at stream
    * start. StreamingSpec proves the final generation equals
    * [[graft.operators.Similarity.annRebucketLifecycle]] one-shot over
    * (base ∪ shards) and that a replayed shard is a state no-op — the
    * shared-oracle d18 pattern (s23's oracle already gates the
    * lifecycle). Caller initializes via [[graft.operators.Similarity
    * .initAnnRebucketState]].
    */
  def runIngestAnnRebucketLoop(spark: SparkSession, shardDir: String,
      name: String, target: Double = 0.3, planes1: Int = 1,
      nProbes: Int = 5, k: Int = 5,
      auditFilter: Column = graft.operators.TextAnalysis.splitBucket(
        col("vec_id")) < 64 || col("vec_id") < 0,
      maxFilesPerTrigger: Int = 1, auditCap: Int = 1 << 17): DataFrame = {
    graft.operators.Dedup.recoverBandedGenerationSwap(spark, name)
    val src = spark.readStream
      .schema(embeddingSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        annRebucketBatchStep(spark, name, preparedVecsOf(batch), target,
          planes1, nProbes, k, auditFilter, auditCap)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.catalog.refreshTable(s"${name}_banded")
    spark.table(s"${name}_banded")
  }

  /** [[runIngestAnnRebucketLoop]]'s TENANT-SCOPED member — s23's table-
    * pair layout driven from ingest: micro-batches fan to their
    * tenants' (banded, vecs, meta) pairs (pmod over vec_id — the s20
    * tenancy), restricted to the batch's touched-tenant set first, and
    * each touched tenant runs the shared batch step independently: a
    * shard full of one tenant's vectors re-buckets that tenant's
    * generation alone, every other tenant's tables (and their meta's
    * planes) never move. Entry recovery per tenant at stream start;
    * caller initializes each tenant's state over its base slice.
    */
  def runTenantIngestAnnRebucketLoop(spark: SparkSession, shardDir: String,
      namePrefix: String, nTenants: Int = 2, target: Double = 0.3,
      planes1: Int = 1, nProbes: Int = 5, k: Int = 5,
      auditFilter: Column = graft.operators.TextAnalysis.splitBucket(
        col("vec_id")) < 64 || col("vec_id") < 0,
      maxFilesPerTrigger: Int = 1, auditCap: Int = 1 << 17): Unit = {
    (0 until nTenants).foreach(tn =>
      graft.operators.Dedup.recoverBandedGenerationSwap(spark,
        s"${namePrefix}_t$tn"))
    val src = spark.readStream
      .schema(embeddingSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = preparedVecsOf(batch).localCheckpoint()
        for (tn <- touchedTenants(b, nTenants, idCol = "vec_id"))
          annRebucketBatchStep(spark, s"${namePrefix}_t$tn",
            b.filter(pmod(col("vec_id"), lit(nTenants)) === tn),
            target, planes1, nProbes, k, auditFilter, auditCap)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** An arriving embedding batch prepared to the state layout's
    * (vec_id, v, n) — the d17 map-side preparation.
    */
  private def preparedVecsOf(batch: DataFrame): DataFrame = {
    import graft.functions.Exprs.{doubleVector, l2Norm}
    batch.select(col("vec_id"), doubleVector(col("embedding")).as("v"))
      .withColumn("n", l2Norm(col("v")))
  }

  /** One micro-batch's monitor→action step for an ANN re-bucket state
    * (ONE definition — fleet and tenant loops; the rebandBatchStep
    * shape for the vector store).
    */
  private def annRebucketBatchStep(spark: SparkSession, name: String,
      slice: DataFrame, target: Double, planes1: Int, nProbes: Int,
      k: Int, auditFilter: Column, auditCap: Int): Unit = {
    import graft.operators.Similarity
    spark.catalog.refreshTable(s"${name}_vecs")
    val fresh = slice
      .join(spark.table(s"${name}_vecs").select("vec_id"),
        Seq("vec_id"), "left_anti")
      .localCheckpoint()
    if (!fresh.isEmpty) {
      Similarity.appendAnnRebucketState(spark, name, fresh)
      spark.catalog.refreshTable(s"${name}_vecs")
      val audit = boundedAudit(
        spark.table(s"${name}_vecs").filter(auditFilter), auditCap,
        idCol = "vec_id")
      val row = Similarity.annServingBucketRecall(spark, name, audit,
        nProbes, k).head()
      // skip the action once the generation already serves planes1
      // (the reband loop's guard — without it a corpus whose coarse
      // recall still misses would re-hash the full corpus every batch)
      val planes = spark.table(s"${name}_meta").head().getAs[Int]("planes")
      if (row.getAs[Double]("recall") < target && planes != planes1)
        Similarity.rebucketGenerationFromVecs(spark, name, planes1)
    }
  }

  /** [[runIngestRebandLoop]]'s SRP-BANDED-family member — the d41/d64
    * monitor→action loop driven from ingest (the FIFTH looped family;
    * CLAUDE.md's own invariant: keep the matrix square): a stream of
    * embedding shards maintains a persisted SRP banded generation
    * (label, vec_id, band, bucket) plus its `_vecs` companion (the
    * re-band re-hashes retained labeled vectors). Per micro-batch:
    * per-table idempotent appends UNDER THE META'S bands, then the
    * recall monitor over the bounded audit set ([[graft.operators
    * .Dedup.srpServingRecall]] — the ONE monitor definition the
    * d41/d64 lifecycles also measure with; serving rows
    * audit-restricted BEFORE candidate generation), and on a miss the
    * re-band at 8 (OR amplification is monotone — candidates only
    * grow) through the crash-tested meta-last swap, skipped once the
    * generation already serves 8 bands (the reband loop's guard).
    * Entry recovery at stream start; caller initializes via
    * [[graft.operators.Dedup.initSrpRebandState]]. `labelOf` attaches
    * the family's label to arriving vectors: the global-SRP member
    * uses the default lit(0); the SemDeDup members pass the FROZEN
    * fleet k-means assignment (see [[runIngestSemDedupRebandLoop]]).
    * StreamingSpec proves the final generation equals
    * [[graft.operators.Dedup.srpRebandLifecycle]] one-shot over
    * (base ∪ shards) and replay is a state no-op — the d18
    * shared-oracle pattern (d41/d64's oracles gate the lifecycle).
    */
  def runIngestSrpRebandLoop(spark: SparkSession, shardDir: String,
      name: String, threshold: Double = 0.3, target: Double = 0.9,
      auditFilter: Column = graft.operators.TextAnalysis.splitBucket(
        col("vec_id")) < 64 || col("vec_id") < 0,
      maxFilesPerTrigger: Int = 1, auditCap: Int = 1 << 17,
      labelOf: DataFrame => DataFrame =
        _.withColumn("label", lit(0))): DataFrame = {
    graft.operators.Dedup.recoverBandedGenerationSwap(spark, name)
    val src = spark.readStream
      .schema(embeddingSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        srpRebandBatchStep(spark, name, labelOf(preparedVecsOf(batch)),
          threshold, target, auditFilter, auditCap)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.catalog.refreshTable(s"${name}_banded")
    spark.table(s"${name}_banded")
  }

  /** [[runIngestSrpRebandLoop]]'s TENANT-SCOPED member — d64's
    * table-pair layout driven from ingest: micro-batches fan to their
    * tenants' (banded, vecs, meta) tables (pmod over vec_id),
    * restricted to the batch's touched-tenant set first; each touched
    * tenant runs the shared batch step independently — a tripped
    * tenant re-bands alone, every other tenant's generation (and its
    * meta's bands) never moves. Entry recovery per tenant at stream
    * start; caller initializes each tenant's state over its base
    * slice via [[graft.operators.Dedup.initSrpRebandState]].
    */
  def runTenantIngestSrpRebandLoop(spark: SparkSession, shardDir: String,
      namePrefix: String, nTenants: Int = 2, threshold: Double = 0.3,
      target: Double = 0.9,
      auditFilter: Column = graft.operators.TextAnalysis.splitBucket(
        col("vec_id")) < 64 || col("vec_id") < 0,
      maxFilesPerTrigger: Int = 1, auditCap: Int = 1 << 17,
      labelOf: DataFrame => DataFrame =
        _.withColumn("label", lit(0))): Unit = {
    (0 until nTenants).foreach(tn =>
      graft.operators.Dedup.recoverBandedGenerationSwap(spark,
        s"${namePrefix}_t$tn"))
    val src = spark.readStream
      .schema(embeddingSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = labelOf(preparedVecsOf(batch)).localCheckpoint()
        for (tn <- touchedTenants(b, nTenants, idCol = "vec_id"))
          srpRebandBatchStep(spark, s"${namePrefix}_t$tn",
            b.filter(pmod(col("vec_id"), lit(nTenants)) === tn),
            threshold, target, auditFilter, auditCap)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The SEMDEDUP members (the SIXTH looped family): the SRP reband
    * loop under the FROZEN fleet k-means labels — the d42/d65 action
    * driven from ingest. The model is corpus state (the d42/d63 rule:
    * slicing or ingest must not move centroids), so arriving vectors
    * are labeled by the CALLER-PROVIDED frozen model and the loop
    * machinery — ONE batch-step body — is [[runIngestSrpRebandLoop]]'s
    * verbatim; within-cluster banding falls out of label riding the
    * candidate block keys.
    */
  def runIngestSemDedupRebandLoop(spark: SparkSession, shardDir: String,
      name: String, model: Array[(Int, Array[Double])],
      threshold: Double = 0.3, target: Double = 0.9,
      auditFilter: Column = graft.operators.TextAnalysis.splitBucket(
        col("vec_id")) < 64 || col("vec_id") < 0,
      maxFilesPerTrigger: Int = 1, auditCap: Int = 1 << 17): DataFrame =
    runIngestSrpRebandLoop(spark, shardDir, name, threshold, target,
      auditFilter, maxFilesPerTrigger, auditCap,
      labelOf = _.withColumn("label",
        graft.operators.Similarity.assignExpr(model)))

  /** [[runIngestSemDedupRebandLoop]]'s TENANT-SCOPED member — d65's
    * table-pair layout driven from ingest, same frozen-model labeling,
    * same shared batch-step body.
    */
  def runTenantIngestSemDedupRebandLoop(spark: SparkSession,
      shardDir: String, namePrefix: String,
      model: Array[(Int, Array[Double])], nTenants: Int = 2,
      threshold: Double = 0.3, target: Double = 0.9,
      auditFilter: Column = graft.operators.TextAnalysis.splitBucket(
        col("vec_id")) < 64 || col("vec_id") < 0,
      maxFilesPerTrigger: Int = 1, auditCap: Int = 1 << 17): Unit =
    runTenantIngestSrpRebandLoop(spark, shardDir, namePrefix, nTenants,
      threshold, target, auditFilter, maxFilesPerTrigger, auditCap,
      labelOf = _.withColumn("label",
        graft.operators.Similarity.assignExpr(model)))

  /** One micro-batch's monitor→action step for an SRP/SemDeDup reband
    * state (ONE definition — fleet, tenant, global-SRP, and
    * frozen-label SemDeDup members all run exactly this body; the
    * rebandBatchStep shape for the vector banding families).
    */
  private def srpRebandBatchStep(spark: SparkSession, name: String,
      slice: DataFrame, threshold: Double, target: Double,
      auditFilter: Column, auditCap: Int): Unit = {
    import graft.operators.Dedup
    spark.catalog.refreshTable(s"${name}_vecs")
    val fresh = slice
      .join(spark.table(s"${name}_vecs").select("vec_id"),
        Seq("vec_id"), "left_anti")
      .localCheckpoint()
    if (!fresh.isEmpty) {
      Dedup.appendSrpRebandState(spark, name, fresh)
      spark.catalog.refreshTable(s"${name}_vecs")
      val audit = boundedAudit(
        spark.table(s"${name}_vecs").filter(auditFilter), auditCap,
        idCol = "vec_id")
      val row = Dedup.srpServingRecall(spark, name, audit, threshold)
        .head()
      // skip the action once the generation already serves 8 bands
      // (the reband loop's guard — without it a corpus whose 8-band
      // recall still misses would rebuild every later batch)
      val bands = spark.table(s"${name}_meta").head().getAs[Int]("bands")
      if (row.getAs[Double]("recall") < target && bands != 8)
        Dedup.rebandSrpGenerationFromVecs(spark, name, bands = 8)
    }
  }

  /** CONTINUOUS RETRACTION — the takedown half of [[runIngestCuration]]:
    * a stream of takedown requests (doc_id rows) maintains the SAME
    * persisted stores the ingest loop grows. Per micro-batch:
    *
    *   1. dedup the batch against the takedown log's rows FOR THIS OR A
    *      LATER BATCH ID (replay tolerance scoped to batch identity —
    *      an id logged by an earlier batch is a completed takedown whose
    *      doc may have been re-ingested since, and must remain
    *      re-takedownable; every step below is idempotent on an
    *      already-removed id anyway: its tombstone row is inert, and a
    *      gone id touches no cluster);
    *   2. TOMBSTONE the near-dup index
    *      ([[graft.operators.Dedup.removeFromNearDupIndex]] — served
    *      filtered immediately, physical at the next compaction);
    *   3. RETRACT the label state
    *      ([[graft.operators.Dedup.removeFromLabelState]] — touched
    *      components re-label, splits included, compute bounded by
    *      touched-cluster membership) and fold deletes + relabels into
    *      the store via the generation swap
    *      ([[graft.operators.Dedup.applyLabelRetraction]]);
    *   4. append the batch to the `<name>_log` audit table (batch id +
    *      doc id — the record a compliance pipeline keeps).
    *
    * Apply-then-log ordering is the MIRROR of the ingest loop's: a crash
    * between apply and log refires the batch, whose operations no-op on
    * the already-removed ids, then logs — the log never claims a
    * takedown that did not happen. `documents` is the corpus/document
    * store the re-pairing reads (stale rows for removed ids are fine:
    * only remaining members are re-read). StreamingSpec asserts the
    * post-stream state equals the one-shot recompute over corpus ∖ all
    * takedowns, and that a full replay of the stream is a no-op.
    */
  def runTakedownStream(spark: SparkSession, takedownDir: String,
      indexName: String, labelTable: String, documents: DataFrame,
      threshold: Double = 0.8, name: String = "takedown",
      maxFilesPerTrigger: Int = 1): DataFrame = {
    runTakedownStreamTargets(spark, takedownDir,
      graft.operators.Takedown.Targets(
        nearDupIndex = Some(indexName),
        labelTable = Some(labelTable),
        labelThreshold = threshold,
        documents = Some(documents.localCheckpoint())),
      name, maxFilesPerTrigger)
    spark.table(labelTable)
  }

  /** The fully-general takedown stream: every state class registered in
    * `targets` — all four dedup indexes, the ANN store, labels,
    * subtractive aggregates, sketch cells, the corpus tree — is
    * maintained by the SAME per-batch facade call, so a compliance
    * deployment streams deletions into its whole estate through one
    * query. Returns the takedown log table name.
    */
  def runTakedownStreamTargets(spark: SparkSession, takedownDir: String,
      targets: graft.operators.Takedown.Targets, name: String = "takedown",
      maxFilesPerTrigger: Int = 1): String = {
    import graft.operators.Dedup
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(takedownDir)
    val logTable = s"${name}_log"
    // stale warehouse dir without a catalog entry (prior JVM) would fail
    // the first log append — the appendTombstones gotcha
    if (!spark.catalog.tableExists(logTable))
      Dedup.dropTableAndLocation(spark, logTable)
    // the per-batch core IS the unified facade (graft.operators.Takedown):
    // batch-identity-scoped replay dedup, per-class retraction fan-out,
    // apply-then-log — streaming and batch takedowns share one code path
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Takedown(spark, batch, targets, logTable, batchId)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    logTable
  }

  /** The td2 facade under TRUE streaming ingest: a stream of takedown
    * requests fans per micro-batch through
    * [[graft.operators.Takedown.applyTenant]] — the tenant-scoped core
    * that lands PHYSICAL via per-family tenant compaction — so
    * streaming and batch tenant takedowns share one code path (the
    * runTakedownStream rule). Ids outside the tenant drop per the
    * facade contract (a tenant's stream must not reach another
    * tenant's estate); replay safety is the facade's batch-identity
    * dedup, and every per-family step is idempotent on an
    * already-removed id.
    */
  def runTenantTakedownStream(spark: SparkSession, takedownDir: String,
      tenant: Int, nTenants: Int,
      targets: graft.operators.Takedown.TenantTargets,
      name: String = "tenant_takedown", maxFilesPerTrigger: Int = 1): String = {
    import graft.operators.Dedup
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(takedownDir)
    val logTable = s"${name}_log"
    if (!spark.catalog.tableExists(logTable))
      Dedup.dropTableAndLocation(spark, logTable)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Takedown.applyTenant(spark, batch, tenant,
          nTenants, targets, logTable, batchId)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    logTable
  }

  /** STREAMING estate sync — the generation-swap half of the loop (the
    * takedown stream's twin): corpus-diff files (e3's corpusDiff rows)
    * arrive as a stream, one published generation per file, and each
    * micro-batch fans through ONE [[graft.operators.Dedup.syncEstateWithDiff]]
    * call against the CURRENT corpus tree (`targetsOf` re-reads the
    * payload per batch). Two properties make this replay-safe WITHOUT a
    * batch-identity log:
    *
    *   - 'added' rows apply as 'changed' (delete-then-insert): every
    *     arm is then remove+compact+append-idempotent, so a crash-
    *     refired or wholesale-replayed batch CONVERGES instead of
    *     duplicating index rows (a plain append of an already-present
    *     added id would violate the upsert contract);
    *   - applying a diff CHAIN with the LATEST tree as payload lands
    *     each family at the latest generation: membership telescopes
    *     through the diffs, and any came doc's payload row is its
    *     latest text — a doc added then later removed is simply absent
    *     from the payload and drops in the append's semi-join.
    *
    * StreamingSpec drives gen A→B→C through two runs, replays the whole
    * stream, and equality-checks every family against the gen-C
    * recompute.
    *
    * PER-BATCH CORPUS RE-READ, EXPLICITLY: `targetsOf` receives a fresh
    * `spark.read.parquet(corpusPath)` every micro-batch — the compute
    * each arm does over it is diff-sized (the came rows semi-join it
    * down), but the listing/scan SETUP repeats per trigger, and the
    * convergence argument above requires `corpusPath` to BE the latest
    * published tree whenever a batch (first-run or replayed) fires. At
    * one-file-per-trigger that setup cost is the price of the no-log
    * replay contract; a deployment syncing many generations per run
    * should raise `maxFilesPerTrigger` (diffs telescope — one batch
    * carrying N diff files converges identically) before reaching for
    * anything stateful.
    *
    * `checkpointLocation`: None (default, the spec's mode) replays the
    * ENTIRE diff history on every restart — convergent by the contract
    * above but O(all generations) of remove/compact/append per restart.
    * A production deployment passes Some(dir) so a restart resumes from
    * the last committed diff file; replay-idempotence still covers the
    * one batch a crash can refire.
    */
  def runEstateSyncStream(spark: SparkSession, diffDir: String,
      corpusPath: String,
      targetsOf: DataFrame => graft.operators.Dedup.EstateSyncTargets,
      maxFilesPerTrigger: Int = 1,
      checkpointLocation: Option[String] = None): Unit = {
    val src = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("status", StringType),
        StructField("lang", StringType),
        StructField("prev_lang", StringType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(diffDir)
    val q = checkpointLocation.foldLeft(src.writeStream)(
        (w, dir) => w.option("checkpointLocation", dir))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val diff = batch
          .withColumn("status", when(col("status") === "added",
            lit("changed")).otherwise(col("status")))
          .localCheckpoint()
        graft.operators.Dedup.syncEstateWithDiff(spark, diff,
          targetsOf(spark.read.parquet(corpusPath)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** [[runEstateSyncStream]]'s TENANT-SCOPED member — the takedown
    * stream's applyTenant twin for the generation-swap half: each
    * micro-batch fans ONE tenant's slice of the arriving diff through
    * [[graft.operators.Dedup.syncTenantEstateWithDiff]], so a
    * per-tenant corpus publisher gets the same no-log replay safety
    * (added→changed delete-then-insert; diff chains telescope under
    * the latest payload) while every OTHER tenant's partitions never
    * move across the whole chain — isolation held batch after batch,
    * not just for one sync (StreamingSpec pins the other tenant at its
    * original generation through an A→B→C chain plus a full replay).
    * Same per-batch corpus re-read and `checkpointLocation` contracts
    * as the fleet stream.
    */
  def runTenantEstateSyncStream(spark: SparkSession, diffDir: String,
      corpusPath: String, tenant: Int, nTenants: Int,
      targetsOf: DataFrame => graft.operators.Dedup.TenantEstateSyncTargets,
      maxFilesPerTrigger: Int = 1,
      checkpointLocation: Option[String] = None): Unit = {
    val src = spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("status", StringType),
        StructField("lang", StringType),
        StructField("prev_lang", StringType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(diffDir)
    val q = checkpointLocation.foldLeft(src.writeStream)(
        (w, dir) => w.option("checkpointLocation", dir))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val diff = batch
          .withColumn("status", when(col("status") === "added",
            lit("changed")).otherwise(col("status")))
          .localCheckpoint()
        graft.operators.Dedup.syncTenantEstateWithDiff(spark, diff,
          tenant, nTenants, targetsOf(spark.read.parquet(corpusPath)))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** STREAMING sequence packing — the ingest loop's member of the t23
    * family: each micro-batch of arriving documents gets its placements
    * from the persisted token TOTAL (t23c's one-number state) and the
    * total advances; already-written placements never move (the
    * append-only property of concat-and-chunk in id order). Per batch:
    *
    *   1. skip if the state row's batch_id ≥ this batch (crash-refire);
    *   2. placements = batch-local prefix sum + stored total (the batch
    *      is trigger-bounded, so one batch-level window is the honest
    *      plan — the corpus-level two-level machinery lives in t23);
    *   3. placements land via DYNAMIC PARTITION OVERWRITE of this
    *      batch's partition — a refire that recomputes them overwrites
    *      its own partition with identical rows, never duplicates;
    *   4. the state row advances by GENERATION SWAP to (batchId, total').
    *
    * Write-placements-then-advance ordering makes every crash window
    * safe: placements without the advance refire into an identical
    * overwrite; an advance without a crash needs nothing. Requires the
    * monotone-id ingest contract (ids in a later batch exceed earlier
    * ones — how packing stays append-only at all); StreamingSpec asserts
    * stream == batch recompute and replay is a no-op.
    *
    * `epochWeightsPct` turns the loop into the MIXTURE ingest path: each
    * arriving doc expands map-side to its t26 replica set
    * ([[graft.operators.TextAnalysis.epochUpsampleOf]] — the same md5
    * coin the t26 oracle gates) before placement, and the output carries
    * (doc_id, epoch). Replica ids (doc_id·8 + epoch) inherit the
    * monotone contract from doc ids, so the stream equals the one-shot
    * [[graft.operators.TextAnalysis.packUpsampledOf]] over base ∪ all
    * shards (StreamingSpec asserts it).
    */
  def runPackingStream(spark: SparkSession, shardDir: String,
      name: String = "packing", seqLen: Int = 2048,
      maxFilesPerTrigger: Int = 1,
      epochWeightsPct: Option[Map[String, Int]] = None): DataFrame = {
    import graft.operators.Dedup
    val stateT = s"${name}_state"
    val outT = s"${name}_placements"
    if (!spark.catalog.tableExists(stateT)) {
      Seq(stateT, s"${stateT}__gen", outT).foreach(t =>
        Dedup.dropTableAndLocation(spark, t))
      import spark.implicits._
      Seq((-1L, 0L)).toDF("batch_id", "total").write.saveAsTable(stateT)
    }
    val q = documentSource(spark, shardDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        spark.catalog.refreshTable(stateT)
        val st = spark.table(stateT).head()
        if (st.getAs[Long]("batch_id") < batchId) {
          val total = st.getAs[Long]("total")
          val toks0 = batch.select(col("doc_id"), col("lang"),
            size(graft.functions.Exprs.tokens(col("text"))).cast("long").as("n_tokens"))
          // mixture mode: expand each doc to its replica set map-side;
          // the unit of placement becomes the replica id
          val toks = epochWeightsPct.fold(
              toks0.select(col("doc_id"), col("n_tokens"))) { wp =>
            // the packUpsampledOf guard — a weight >= 800 would alias one
            // doc's epoch 8 onto the next doc's epoch 0 in the replica id
            require(wp.values.forall(_ < 800), "replica id packs 8 epochs/doc")
            graft.operators.TextAnalysis.epochUpsampleOf(toks0, wp)
              .filter(col("n_epochs") > 0)
              .withColumn("epoch",
                explode(sequence(lit(0L), col("n_epochs") - 1)))
              .select((col("doc_id") * 8 + col("epoch")).as("doc_id"),
                col("n_tokens"))
          }.localCheckpoint()
          val w = Window.orderBy(col("doc_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val idCols: Seq[org.apache.spark.sql.Column] =
            if (epochWeightsPct.isEmpty) Seq(col("doc_id"))
            else Seq(expr("doc_id div 8").as("doc_id"),
              pmod(col("doc_id"), lit(8L)).as("epoch"))
          val placed = toks
            .withColumn("cum", sum(col("n_tokens")).over(w) + total)
            .select(idCols ++ Seq(col("n_tokens"),
              expr(s"(cum - n_tokens) div ${seqLen}L").as("seq_first"),
              expr(s"(cum - 1) div ${seqLen}L").as("seq_last"),
              pmod(col("cum") - col("n_tokens"), lit(seqLen.toLong)).as("seq_offset"),
              lit(batchId).as("batch_id")): _*)
            .localCheckpoint()
          val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
          try {
            if (!spark.catalog.tableExists(outT))
              placed.write.partitionBy("batch_id").saveAsTable(outT)
            else {
              spark.catalog.refreshTable(outT)
              placed.write.mode("overwrite").insertInto(outT)
            }
          } finally prior match {
            case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
            case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
          }
          val newTotal = total +
            toks.agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0)
          val tmp = s"${stateT}__gen"
          Dedup.recoverGenerationSwap(spark, stateT, tmp)
          Dedup.dropTableAndLocation(spark, tmp)
          import spark.implicits._
          Seq((batchId, newTotal)).toDF("batch_id", "total")
            .write.saveAsTable(tmp)
          Dedup.dropTableAndLocation(spark, stateT)
          spark.sql(s"ALTER TABLE $tmp RENAME TO $stateT")
          spark.catalog.refreshTable(stateT)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.catalog.refreshTable(outT)
    spark.table(outT)
  }

  /** Run the streaming delta dedup over a shard directory to completion
    * (memory sink, AvailableNow).
    */
  def runDeltaNearDupToCompletion(spark: SparkSession, shardDir: String,
      index: graft.operators.Dedup.NearDupIndex,
      name: String = "delta_neardup"): DataFrame = {
    val q = deltaNearDupStream(documentSource(spark, shardDir), index).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** STREAMING simhash delta — [[deltaNearDupStream]]'s topology for the
    * simhash family (d15), simpler because the 8-byte signature is its
    * own verification payload: arriving documents derive the 64-bit
    * signature + band chunks MAP-SIDE (native SimHash64Expr), the band
    * keys stream-static-join the persisted signature index, exact
    * Hamming filters inside the join row, and multi-band / replayed
    * duplicates collapse through `dropDuplicatesWithinWatermark` on the
    * id pair.
    */
  def deltaSimhashStream(newDocs: DataFrame,
      index: graft.operators.Dedup.SimHashIndex,
      maxHamming: Int = 3): DataFrame = {
    val sigs = newDocs
      .withWatermark("ts", "1 hour")
      .select(col("doc_id"), col("ts"),
        coalesce(graft.plans.SimHashExpr.simhash64(
          graft.functions.Exprs.tokens(col("text"))), lit(0L)).as("simhash"))
    val banded = sigs
      .select(col("doc_id"), col("ts"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("b"))
      .withColumn("chunk", expr("(simhash >> (b * 16)) & 65535"))
    banded
      .join(index.banded.select(col("b"), col("chunk"),
        col("doc_id").as("id_o"), col("simhash").as("sh_o")), Seq("b", "chunk"))
      .withColumn("hamming", expr("CAST(bit_count(simhash ^ sh_o) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_id").as("id_n"), col("id_o"), col("ts"), col("hamming"))
      .dropDuplicatesWithinWatermark("id_n", "id_o")
      .select(least(col("id_n"), col("id_o")).as("id_a"),
        greatest(col("id_n"), col("id_o")).as("id_b"), col("hamming"))
  }

  /** Run the streaming simhash delta over a shard directory to
    * completion (memory sink, AvailableNow).
    */
  def runDeltaSimhashToCompletion(spark: SparkSession, shardDir: String,
      index: graft.operators.Dedup.SimHashIndex, maxHamming: Int = 3,
      name: String = "delta_simhash"): DataFrame = {
    val q = deltaSimhashStream(documentSource(spark, shardDir), index, maxHamming)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  private val embeddingSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private[graft] def embeddingSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(embeddingSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(col("vec_id") * 1000000L))

  /** STREAMING embedding delta — [[deltaNearDupStream]]'s topology for the
    * embedding family (d17): arriving vectors prepare (v, n) and their
    * banded LSH buckets MAP-SIDE (the hyperplanes are literals), the band
    * keys stream-static-join the persisted banded index, replay and
    * multi-band duplicates collapse through `dropDuplicatesWithinWatermark`
    * on the id pair, and the exact-cosine verify joins the static vector
    * payload AFTER that dedup — so wide vectors enter exactly one
    * stream row per surviving candidate. The stream side carries its own
    * (v, n) through the banded explode (bands× amplification of one
    * narrow row — the price of a stream not being able to re-join itself;
    * batch d17 re-joins after distinct instead). Shard-internal pairs
    * settle at the next batch index upsert, as in the d13/d15 twins.
    */
  def deltaEmbeddingStream(newVecs: DataFrame,
      index: graft.operators.Dedup.EmbIndex,
      threshold: Double = 0.35): DataFrame = {
    import graft.functions.Exprs.{doubleVector, dotProduct, l2Norm}
    val prepared = newVecs
      .withWatermark("ts", "1 hour")
      .select(col("label"), col("vec_id"), col("ts"),
        doubleVector(col("embedding")).as("v"))
      .withColumn("n", l2Norm(col("v")))
    val banded = graft.operators.Dedup.embBandedOf(prepared, 4, 2,
      carry = Seq("ts", "v", "n"))
    banded
      .join(index.banded.select(col("label"), col("band"), col("bucket"),
        col("vec_id").as("id_o")), Seq("label", "band", "bucket"))
      .select(col("vec_id").as("id_n"), col("id_o"), col("ts"),
        col("v").as("v_n"), col("n").as("n_n"))
      .dropDuplicatesWithinWatermark("id_n", "id_o")
      .join(index.vectors.select(col("vec_id").as("id_o"),
        col("v").as("v_o"), col("n").as("n_o")), Seq("id_o"))
      .withColumn("cos",
        round(dotProduct(col("v_n"), col("v_o")) / (col("n_n") * col("n_o")), 4))
      .filter(col("cos") >= threshold)
      .select(least(col("id_n"), col("id_o")).as("id_a"),
        greatest(col("id_n"), col("id_o")).as("id_b"), col("cos"))
  }

  /** CONTINUOUS ANN INGEST — [[runIngestNearDup]]'s loop for the vector
    * serving index ([[graft.operators.Similarity.AnnIndex]]): per
    * micro-batch,
    *
    *   1. drop already-indexed vec_ids (idempotence under at-least-once
    *      delivery — anti-join against the bucketed vectors table, the
    *      same contract as the document loop's shingle anti-join);
    *   2. quantize, cluster-assign and band the survivors MAP-SIDE under
    *      the index's FROZEN model and append them via the
    *      bucket-spec-matched INSERT INTO
    *      ([[graft.operators.Similarity.appendAnnIndex]]).
    *
    * New vectors are searchable by every tier from the next query against
    * the loaded index. Because the append is a pure per-row function of
    * the frozen model, the final vectors table equals ONE
    * [[graft.operators.Similarity.appendAnnIndex]] of all new vectors
    * over the base build, under any batching or replay — StreamingSpec
    * asserts that identity. Periodic
    * [[graft.operators.Similarity.compactAnnIndex]] restores the
    * one-file-per-bucket sorted reads; [[graft.operators.Similarity
    * .annIndexDrift]] is the re-train (generation-rebuild) trigger.
    */
  def runIngestAnnIndex(spark: SparkSession, shardDir: String,
      indexName: String, maxFilesPerTrigger: Int = 1,
      takedownLog: String = "takedown_log"): DataFrame = {
    import graft.functions.Exprs.{doubleVector, l2Norm}
    import graft.operators.Similarity
    val src = spark.readStream
      .schema(embeddingSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // the previous batch appended — read the grown table, not a
        // cached relation
        spark.catalog.refreshTable(s"${indexName}_vectors")
        val prepared = batch
          .select(col("vec_id"), doubleVector(col("embedding")).as("v"))
          .withColumn("n", l2Norm(col("v")))
        val fresh = prepared
          .join(spark.table(s"${indexName}_vectors").select("vec_id"),
            Seq("vec_id"), "left_anti")
          .localCheckpoint()
        if (!fresh.isEmpty) {
          Similarity.appendAnnIndex(spark, indexName, fresh)
          // the re-ingest hook for the vector estate (doc_id == vec_id
          // in the takedown log's id space)
          graft.operators.Takedown.clearTakedownLog(spark,
            fresh.select(col("vec_id").as("doc_id")), takedownLog)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(s"${indexName}_vectors")
  }

  /** STREAMING SemDeDup — the fifth family's curation under true ingest
    * (d21b's loop form): per micro-batch,
    *
    *   1. drop already-indexed vec_ids (idempotence — the serving index
    *      is the id store, same contract as [[runIngestAnnIndex]]);
    *   2. append the fresh vectors into the persisted ANN index — the
    *      FROZEN model assigns their coarse clusters map-side;
    *   3. read the batch's touched cluster ids back from the INDEX (the
    *      stored assignment is the source of truth, never re-derived);
    *   4. re-curate exactly those clusters over their full post-append
    *      membership ([[graft.operators.Dedup.semDedupOf]] under the
    *      frozen centroids) and generation-swap the changed slice into
    *      the persisted curation table (crash-safe via the recovered
    *      `__gen` pattern).
    *
    * SemDeDup groups are cluster-confined, so the final table equals the
    * one-shot [[graft.operators.Dedup.semDedupOf]] over base ∪ all
    * shards under the base-frozen model — whatever the batching or
    * replay order (StreamingSpec asserts the identity). Caller
    * initializes the index (saveAnnIndex over the base) and the curation
    * table (semDedupOf over the base, saved bucketed by cl).
    */
  def runIngestSemDedup(spark: SparkSession, shardDir: String,
      indexName: String, curTable: String, threshold: Double = 0.45,
      maxFilesPerTrigger: Int = 1,
      takedownLog: String = "takedown_log"): DataFrame = {
    import graft.functions.Exprs.{doubleVector, l2Norm}
    import graft.operators.{Dedup, Similarity}
    val src = spark.readStream
      .schema(embeddingSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        spark.catalog.refreshTable(s"${indexName}_vectors")
        val prepared = batch
          .select(col("vec_id"), doubleVector(col("embedding")).as("v"))
          .withColumn("n", l2Norm(col("v")))
        val fresh = prepared
          .join(spark.table(s"${indexName}_vectors").select("vec_id"),
            Seq("vec_id"), "left_anti")
          .localCheckpoint()
        if (!fresh.isEmpty) {
          Similarity.appendAnnIndex(spark, indexName, fresh)
          spark.catalog.refreshTable(s"${indexName}_vectors")
          val index = Similarity.loadAnnIndex(spark, indexName)
          val touched = index.vectors
            .join(fresh.select(col("vec_id")), Seq("vec_id"), "left_semi")
            .select(col("cl")).distinct().localCheckpoint()
          val recurated = Dedup.semDedupOf(
            index.vectors.select(col("vec_id"), col("v"), col("n"), col("cl"))
              .join(broadcast(touched), Seq("cl"), "left_semi"),
            index.centroids, threshold)
            .localCheckpoint()
          // generation swap of the changed cluster slice (crash-safe:
          // a committed __gen from a dead prior call is completed first)
          val tmp = s"${curTable}__gen"
          Dedup.recoverGenerationSwap(spark, curTable, tmp)
          Dedup.dropTableAndLocation(spark, tmp)
          spark.table(curTable)
            .join(broadcast(touched), Seq("cl"), "left_anti")
            .unionByName(recurated.select(spark.table(curTable).columns.map(col).toIndexedSeq: _*))
            .repartition(8, col("cl"))
            .write.bucketBy(8, "cl").sortBy("cl")
            .saveAsTable(tmp)
          Dedup.dropTableAndLocation(spark, curTable)
          spark.sql(s"ALTER TABLE $tmp RENAME TO $curTable")
          spark.catalog.refreshTable(curTable)
          // the re-ingest hook (see runIngestNearDup)
          graft.operators.Takedown.clearTakedownLog(spark,
            fresh.select(col("vec_id").as("doc_id")), takedownLog)
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(curTable)
  }

  /** Run the streaming embedding delta over a shard directory to
    * completion (memory sink, AvailableNow).
    */
  def runDeltaEmbeddingToCompletion(spark: SparkSession, shardDir: String,
      index: graft.operators.Dedup.EmbIndex, threshold: Double = 0.35,
      name: String = "delta_embedding"): DataFrame = {
    val q = deltaEmbeddingStream(embeddingSource(spark, shardDir), index, threshold)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** The SpaceSaving frequent-items sketch under INCREMENTAL execution:
    * per event_type, the sketch of active user ids, maintained across
    * micro-batches through the state store (exercising the aggregation
    * buffer's serialize/merge/deserialize path, which batch mode never
    * round-trips). With capacity above the distinct-user count the sketch
    * is exact, so the result equals the batch-mode sketch row for row —
    * the equality StreamingSpec asserts. Under eviction the summary SET
    * depends on merge order (see SpaceSavingAgg), so a production
    * streaming deployment reports it the t15 way: guarantees, not raw
    * contents.
    */
  /** STREAMING sketch-state maintenance — a2c's ingest twin: per
    * micro-batch, fold the batch's events into per (event_type, epoch-day)
    * HLL cells and APPEND them to the persisted sketch-state table. No
    * dedup, no idempotence bookkeeping, no read-modify-write: the
    * register merge ([[graft.plans.HllMergeAgg]]) is associative,
    * commutative and IDEMPOTENT, so duplicate cells from replayed shards,
    * split batches, or overlapping days all converge at READ time — the
    * rollup merges whatever cells exist. This is the sketch analogue of
    * an append-only updates log where replay safety comes from the
    * algebra instead of from anti-joins (contrast runIngestCuration's
    * two-store idempotence key). Compaction (optional) re-aggregates the
    * cell table itself with hll_sketch-of-merge; the spec proves streamed
    * cells — including a replayed shard — merge register-identically to
    * the one-shot batch sketch.
    */
  def runIngestSketches(spark: SparkSession, shardDir: String,
      table: String, maxFilesPerTrigger: Int = 1): DataFrame = {
    val dayUs = 86400L * 1000 * 1000
    // schema from the ARRIVED footer, never hardcoded — the events `ts`
    // encoding lesson (Tables.normalizeTs) applies to shard streams too
    val arrivedSchema = spark.read.parquet(shardDir).schema
    val src = spark.readStream
      .schema(arrivedSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(shardDir)
    val q = graft.Tables.normalizeTs(src).writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .select(col("event_type"), unix_micros(col("ts")).as("us"), col("user_id"))
          .select(col("event_type"), expr(s"us div ${dayUs}L").as("day"), col("user_id"))
          .groupBy(col("event_type"), col("day"))
          .agg(graft.plans.HllAgg.hllSketch(col("user_id")).as("sk"))
          .write.mode("append").saveAsTable(table)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the serving rollup: merge whatever cells exist per group
    spark.table(table)
      .groupBy(col("event_type"), col("day"))
      .agg(graft.plans.HllAgg.hllMerge(col("sk")).as("est_users"))
  }

  def heavyHitterSketch(spark: SparkSession, dir: String,
      capacity: Int = 256, name: String = "events_hh"): DataFrame = {
    val q = eventSource(spark, dir)
      .groupBy(col("event_type"))
      .agg(graft.plans.SpaceSavingAgg
        .spaceSavingTopK(col("user_id").cast("string"), capacity).as("sk"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
