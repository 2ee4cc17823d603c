package graft.operators

import graft.Tables
import graft.functions.Exprs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator inventory — the reference's query surface
  * (SURVEY.md §2: scans, filters, joins, aggregations, sorts, windows, set
  * ops) restated over the harness star schema per FIXTURES.md §B.
  *
  * Scale notes, applied throughout:
  *   - dimension tables (part/orders-sized next to lineitem) are broadcast —
  *     no shuffle of the fact side for J1/J2/J6-shaped joins;
  *   - every histogram is a single hash aggregation (partial+final), the
  *     reference's per-playlist N+1 loop (itdbloader.py:260-267) collapses
  *     into ONE shuffle;
  *   - filters/projections sit directly on the parquet scan so Catalyst
  *     pushes them down;
  *   - window functions always carry a full deterministic ordering key.
  */
object Library {

  /** A1 (itdb2html.py:371-374): total count smoke stat. */
  def countTotal(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(count(lit(1)).as("n"))

  /** A2 (itdb2html.py:375-384): exact distinct counts. Exact (not approx) to
    * match the reference's COUNT(DISTINCT ...); both computed in one pass.
    */
  def countDistincts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"))

  /** A3 (itdb2html.py:388-398): ratings histogram, null→0 bucket. */
  def starsHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(starsFromDiscount(col("l_discount")).as("stars"))
      .agg(count(lit(1)).as("n"))

  /** A4 (itdb2html.py:264-284): two-key grouped histogram (genre×stars
    * analogue), null group → ''.
    */
  def twoKeyHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(coalesce(col("l_returnflag"), lit("")).as("flag"),
        starsFromDiscount(col("l_discount")).as("stars"))
      .agg(count(lit(1)).as("n"))

  /** A5 (itdb2html.py:286-308): parameterized histogram over a named
    * dimension column.
    */
  def paramHistogram(spark: SparkSession, dir: String, dim: String = "p_brand"): DataFrame =
    Tables.part(spark, dir)
      .groupBy(col(dim).as("grp"), (col("p_size") % 6).cast("long").as("stars"))
      .agg(count(lit(1)).as("n"))

  /** A6 + J1 — the reference's flagship: per-playlist star histogram
    * (itdbloader.py:269-293). tracks⋈playlist_tracks ≅ lineitem⋈orders; the
    * N+1 per-playlist loop becomes ONE broadcast join + ONE hash aggregation.
    * orders:lineitem is 1:4 here, but the grouped result is tiny, so the agg
    * is the only shuffle; at 100 TB AQE sizes the final aggregation and the
    * join stays shuffle-on-orderkey (or bucketed/co-partitioned storage).
    */
  def playlistStats(spark: SparkSession, dir: String): DataFrame =
    playlistStatsOf(
      Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_discount")),
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority")))

  private def playlistStatsOf(li: DataFrame, o: DataFrame): DataFrame =
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority").as("priority"),
        starsFromDiscount(col("l_discount")).as("stars"))
      .agg(count(lit(1)).as("n"))

  /** A6B — the a6 flagship on a MULTI-TENANT layout: every reference
    * query filters one User_ID (SURVEY F1 — itdb is per-user throughout),
    * and at 100 TB the layout that makes such filters cheap is
    * PARTITION-BY-TENANT: each tenant's rows live under their own
    * partition directory, so a tenant predicate prunes at PLANNING time
    * and the scan never opens another tenant's files (isolation by
    * listing, not by filtering — the per-tenant cost is the tenant's own
    * data, independent of corpus size). The gate builds the partitioned
    * fact table once per session (ingest-side state, the d13 convention),
    * then runs a6's join+agg over ONE tenant; PlanSpec asserts the
    * predicate lands in the scan's PartitionFilters.
    */
  def tenantStats(spark: SparkSession, dir: String, tenant: Int = 3,
      nTenants: Int = 8): DataFrame = {
    // nTenants shapes the persisted layout → it belongs in BOTH the cache
    // key and the table name (a second call with a different nTenants must
    // build its own table, not silently read the stale layout)
    val table = graft.SessionCache.getOrElseUpdate(spark,
        ("tenantLineitem", dir, nTenants)) {
      val name = f"tenant_lineitem_${nTenants}_${dir.hashCode & 0xffffffffL}%x"
      Dedup.dropTableAndLocation(spark, name)
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_discount"),
          pmod(col("l_orderkey"), lit(nTenants)).as("tenant"))
        .write.partitionBy("tenant").saveAsTable(name)
      name
    }.asInstanceOf[String]
    playlistStatsOf(
      spark.table(table).filter(col("tenant") === tenant)
        .select(col("l_orderkey"), col("l_discount")),
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority")))
  }

  /** I6: INCREMENTALLY-MAINTAINED AGGREGATE — the §2.12 freshness family
    * finally gate-checked end to end: the materialized stats table
    * (playlist_stats, THE reference's precomputed aggregate,
    * itdbloader.py:260-293) is kept current under ingest by MERGING a
    * delta aggregation into the persisted base instead of rescanning the
    * fact table. Counts are additive, so
    *
    *   stats(base ∪ delta) = stats(base) ⊎ stats(delta)
    *
    * exactly — a full-outer merge on the group key with coalesced
    * zero-fill, provably identical to the full recompute (the shared a6
    * oracle IS the full recompute). The base aggregate persists through
    * the real disk path once per (session, dir, splitAt) — the d13
    * serving-state pattern — and the per-ingest cost is the DELTA's
    * aggregation plus a group-count-sized merge, never the history scan.
    * The delta split is the t9 md5 bucket of l_orderkey (all lines of an
    * order arrive together, matching ingest reality).
    */
  def incrementalPlaylistStats(spark: SparkSession, dir: String,
      splitAt: Int = 200): DataFrame = {
    val bucket = TextAnalysis.splitBucket(col("l_orderkey"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority"))
    // ONE-TIME ingest-side state (session-cached): the persisted base
    // aggregate AND the delta written out as ITS OWN SHARD — production
    // reality is that the delta ARRIVES as a shard file; carving it out
    // of the full fact table with the md5 split filter is gate
    // scaffolding that round 10's bench measured on every pass (~2 s of
    // the steady cost was the per-pass full-table scan). The measured
    // work per pass is now the true maintenance: scan the SHARD,
    // aggregate it, merge group-count-sized frames.
    val (baseTable, shardPath) = graft.SessionCache.getOrElseUpdate(
        spark, ("statsBase", dir, splitAt)) {
      val t = f"stats_base_${splitAt}_${dir.hashCode & 0xffffffffL}%x"
      Dedup.dropTableAndLocation(spark, t)
      playlistStatsOf(Tables.lineitem(spark, dir)
        .filter(bucket < splitAt)
        .select(col("l_orderkey"), col("l_discount")), o)
        .write.saveAsTable(t)
      val shard = new java.io.File(sys.props("java.io.tmpdir"),
        f"graft_i6_shard_${ProcessHandle.current().pid()}_${splitAt}_${dir.hashCode & 0xffffffffL}%x")
        .getAbsolutePath
      Tables.lineitem(spark, dir)
        .filter(bucket >= splitAt)
        .select(col("l_orderkey"), col("l_discount"))
        .write.mode("overwrite").parquet(shard)
      (t, shard)
    }.asInstanceOf[(String, String)]
    val delta = playlistStatsOf(spark.read.parquet(shardPath), o)
    spark.table(baseTable)
      .select(col("priority"), col("stars"), col("n").as("n_base"))
      .join(delta.select(col("priority"), col("stars"), col("n").as("n_delta")),
        Seq("priority", "stars"), "full_outer")
      .select(col("priority"), col("stars"),
        (coalesce(col("n_base"), lit(0L)) + coalesce(col("n_delta"), lit(0L))).as("n"))
  }

  /** I7: the incrementally-maintained aggregate under RETRACTION — the
    * i6 identity's inverse: counts are SUBTRACTABLE (the property the
    * sketch tables deliberately lack — HLL/GK cells are rebuild-only),
    * so a takedown maintains the materialized stats by
    *
    *   stats(base ∖ removed) = stats(base) ⊖ stats(removed)
    *
    * — aggregate the REMOVED slice only, full-outer merge with
    * subtraction, and drop groups whose count reaches zero (the full
    * recompute never emits them). Per-takedown cost is the removed
    * slice's aggregation plus a group-count-sized merge, never the
    * history rescan; the persisted full-corpus base aggregate is the i6
    * serving state. The takedown class is l_orderkey ≡ 7 (mod 11)
    * (order-grained, matching how a deletion list arrives); the oracle
    * is the full a6 recompute over lineitem ∖ removed.
    */
  def retractedPlaylistStats(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderpriority"))
    // one-time state: the persisted base aggregate + the removed slice
    // extracted once (production fetches the deletion candidates by id
    // from the stored fact table — bucket/partition-pruned — not by
    // rescanning the corpus per maintenance pass)
    val (baseTable, removedPath) = graft.SessionCache.getOrElseUpdate(
        spark, ("statsBaseFull", dir)) {
      val t = f"stats_full_${dir.hashCode & 0xffffffffL}%x"
      Dedup.dropTableAndLocation(spark, t)
      playlistStatsOf(Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_discount")), o)
        .write.saveAsTable(t)
      val rm = new java.io.File(sys.props("java.io.tmpdir"),
        f"graft_i7_removed_${ProcessHandle.current().pid()}_${dir.hashCode & 0xffffffffL}%x")
        .getAbsolutePath
      Tables.lineitem(spark, dir)
        .filter(col("l_orderkey") % 11 === 7)
        .select(col("l_orderkey"), col("l_discount"))
        .write.mode("overwrite").parquet(rm)
      (t, rm)
    }.asInstanceOf[(String, String)]
    val removedAgg = playlistStatsOf(spark.read.parquet(removedPath), o)
    spark.table(baseTable)
      .select(col("priority"), col("stars"), col("n").as("n_base"))
      .join(removedAgg.select(col("priority"), col("stars"), col("n").as("n_rm")),
        Seq("priority", "stars"), "full_outer")
      .select(col("priority"), col("stars"),
        (coalesce(col("n_base"), lit(0L)) - coalesce(col("n_rm"), lit(0L))).as("n"))
      .filter(col("n") > 0)
  }

  /** A7 (itdb2html.py:478-493): re-aggregation of the materialized aggregate —
    * partial/final pattern over playlistStats' output.
    */
  def reaggStats(spark: SparkSession, dir: String): DataFrame =
    playlistStats(spark, dir)
      .groupBy(col("stars"))
      .agg(sum(col("n")).cast("long").as("total"))

  /** A8 (itdb2html.py:310-322): single-group histogram with ORDER BY. */
  def groupOrdered(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_quantity").as("rating"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("rating"))

  /** A9 (itdb2html.py:74-98 addStars): pivot to fixed 6-bucket star columns.
    * Expressed as conditional aggregation — exactly what `pivot` compiles to,
    * but in one job (no distinct-values pre-scan) and codegen-friendly.
    */
  def pivotStars(spark: SparkSession, dir: String, dim: String = "o_orderpriority"): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_discount"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col(dim))
    val st = starsFromDiscount(col("l_discount"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col(dim).as("grp"))
      .agg(
        count(when(st === 0, 1)).as("s0"), count(when(st === 1, 1)).as("s1"),
        count(when(st === 2, 1)).as("s2"), count(when(st === 3, 1)).as("s3"),
        count(when(st === 4, 1)).as("s4"), count(when(st === 5, 1)).as("s5"))
  }

  /** A10 (itdb2html.py:90-98): gated weighted-mean quality per group, built
    * on the A9 pivot. See also the typed Aggregator variant in QualityAgg.
    */
  def qualityPerGroup(spark: SparkSession, dir: String): DataFrame =
    pivotStars(spark, dir)
      .withColumn("quality",
        round(quality(col("s0"), col("s1"), col("s2"), col("s3"), col("s4"), col("s5")), 4))

  /** A11 (itdb2html.py:400-408): percent-of-total via an empty-frame window
    * sum — no second scan, no collect.
    */
  def percentOfTotal(spark: SparkSession, dir: String): DataFrame = {
    val hist = starsHistogram(spark, dir)
    hist.withColumn("pct",
      round(col("n") * 100.0 / sum(col("n")).over(Window.partitionBy()), 4))
  }

  /** A16: exact interpolated percentiles per group — the distribution
    * summary the aggregation family lacked (median + tail). Spark's
    * `percentile` and DuckDB's `quantile_cont` share the same definition
    * (linear interpolation at rank (n-1)·q over the sorted values), so the
    * exact form is oracle-checkable. SCALE NOTE: exact percentiles
    * aggregate a per-group value map whose size is the number of DISTINCT
    * values — fine for bounded-cardinality measures; an unbounded 100 TB
    * measure column would use `approx_percentile` (t-digest, bounded
    * state), the engine-specific twin of this exact tier (same trade as
    * a2 count-distinct vs a2b HLL).
    */
  def groupPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(percentile(col("o_totalprice"), lit(0.5)), 4).as("p50"),
        round(percentile(col("o_totalprice"), lit(0.95)), 4).as("p95"))

  /** A16b — the SCALE twin of [[groupPercentiles]]: `percentile_approx`
    * (Greenwald-Khanna) holds O(accuracy·log n) state per group regardless
    * of value cardinality, vs exact `percentile`'s O(distinct values)
    * buffer — at 100 TB the exact form OOMs on a high-cardinality measure,
    * the sketch doesn't. Gate shape mirrors a2b: the exact percentiles are
    * recomputed HERE purely as the verification reference, and the sketch
    * ships as RANK-band flags — the approx value must lie between the
    * exact percentiles at p ± 0.01. That is the GK guarantee stated
    * directly (rank error ≤ n/accuracy + the ±1-rank discretization a
    * value-vs-interpolation compare can't avoid), deterministic whenever
    * groups exceed ~110 rows, and tighter with scale — unlike a VALUE band,
    * which breaks at small n where adjacent-value gaps exceed any fixed
    * percentage. The oracle asserts the flags TRUE, so the bounded-state
    * tier is hash-checked without demanding cross-engine sketch equality.
    */
  def groupPercentilesApprox(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame = {
    // ONE exact-percentile buffer serves all six reference points (the
    // array form shares a single sorted buffer per group — six scalar
    // calls would hold six copies of the very state this query exists to
    // bound), and one sketch serves both approx points
    val exactPs = array(Seq(0.49, 0.5, 0.51, 0.94, 0.95, 0.96).map(lit): _*)
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        percentile(col("o_totalprice"), exactPs).as("ex"),
        percentile_approx(col("o_totalprice"), array(lit(0.5), lit(0.95)),
          lit(accuracy)).as("ap"))
      .select(col("o_orderpriority"),
        round(element_at(col("ex"), 2), 4).as("p50_exact"),
        round(element_at(col("ex"), 5), 4).as("p95_exact"),
        (element_at(col("ap"), 1) >= element_at(col("ex"), 1) &&
          element_at(col("ap"), 1) <= element_at(col("ex"), 3))
          .as("p50_rank_band"),
        (element_at(col("ap"), 2) >= element_at(col("ex"), 4) &&
          element_at(col("ap"), 2) <= element_at(col("ex"), 6))
          .as("p95_rank_band"))
  }

  /** A16c: PERCENTILE SKETCH-STATE TABLE + windowed re-aggregation — the
    * quantile twin of the a2c HLL cells: per (event_type, epoch-day) GK
    * digests of the event values persist as a bounded binary column
    * ([[graft.plans.PercentileSketchAgg]] — the same summary
    * `percentile_approx` builds, with the SKETCH as the stored value);
    * any later rollup merges stored digests
    * ([[graft.plans.PercentileMergeAgg]]) instead of rescanning the
    * measure column. Unlike the HLL register max, GK merge is NOT
    * idempotent (re-merging the same cell double-counts its rows), so
    * replay safety is the CELL TABLE's key contract — one cell per
    * (group, day), the a2c layout — not the algebra; the rank GUARANTEE
    * survives any merge order, which is what the gate checks.
    *
    * Gate discipline = a16b: exact quantiles recomputed independently as
    * the verification reference, the merged-digest estimates shipped as
    * rank-band flags (estimate between the exact quantiles at p ± 0.01)
    * the oracle asserts TRUE.
    */
  def percentileSketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000 * 1000
    val name = graft.SessionCache.getOrElseUpdate(spark, ("valueSketches", dir)) {
      val t = f"value_sketches_${dir.hashCode & 0xffffffffL}%x"
      Dedup.dropTableAndLocation(spark, t)
      Tables.events(spark, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          col("value").cast("double").as("value"))
        .select(col("event_type"), expr(s"us div ${dayUs}L").as("day"), col("value"))
        .groupBy(col("event_type"), col("day"))
        .agg(graft.plans.PercentileSketchAgg.percentileSketch(col("value")).as("sk"))
        .write.saveAsTable(t)
      t
    }
    val merged = spark.table(name)
      .groupBy(col("event_type"))
      .agg(graft.plans.PercentileSketchAgg
        .percentileMerge(col("sk"), Seq(0.5, 0.95)).as("ap"))
    val exactPs = array(Seq(0.49, 0.5, 0.51, 0.94, 0.95, 0.96).map(lit): _*)
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(percentile(col("value"), exactPs).as("ex"))
    merged.join(exact, Seq("event_type"))
      .select(col("event_type"),
        round(element_at(col("ex"), 2), 4).as("p50_exact"),
        round(element_at(col("ex"), 5), 4).as("p95_exact"),
        (element_at(col("ap"), 1) >= element_at(col("ex"), 1) &&
          element_at(col("ap"), 1) <= element_at(col("ex"), 3))
          .as("p50_rank_band"),
        (element_at(col("ap"), 2) >= element_at(col("ex"), 4) &&
          element_at(col("ap"), 2) <= element_at(col("ex"), 6))
          .as("p95_rank_band"))
  }

  /** A17: ROLLUP multi-level aggregation — per (lang, source), per lang,
    * and grand total in ONE pass (Catalyst plans an Expand + single
    * shuffle, vs three scans for three GROUP BYs). `grouping()` flags
    * disambiguate subtotal rows from genuine NULL key values; coalesced
    * labels keep the output canonicalizable.
    */
  def rollupStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        grouping(col("lang")).cast("long").as("g_lang"),
        grouping(col("source")).cast("long").as("g_source"))
      .select(coalesce(col("lang"), lit("<all>")).as("lang"),
        coalesce(col("source"), lit("<all>")).as("source"),
        col("g_lang"), col("g_source"), col("n_docs"), col("total_chars"))

  /** W6: running-total window frame (ROWS UNBOUNDED PRECEDING) — the
    * cumulative-sum surface distinct from rank/lag/row_number. Partitioned
    * by user, so the sort is per-key and distributed; both engines
    * accumulate in the same (ts, event_id) order, making the double sum
    * fold-order identical.
    */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the accumulator routes through decimal (SURVEY §7.4's money-sum
    // discipline): the fold becomes ASSOCIATIVE-exact, which is what lets
    // the chunked twin (w6b) reproduce this output bit-for-bit from
    // per-chunk partial sums — a double fold is order-dependent and
    // would tie the result to the sequential evaluation order
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        round(sum(col("value").cast("decimal(18,6)")).over(w).cast("double"), 4)
          .as("running_value"))
  }

  /** W6's SKEW-HARDENED twin — the [[chunkedSessionize]] decomposition
    * applied to the cumulative sum (round-10 verdict ask #5): a hot
    * user's running total no longer serializes through one task.
    *
    *   - phase 1 partitions by (user, floor(us/chunkUs)) and computes the
    *     LOCAL decimal prefix sum within each chunk — per-task work
    *     bounded by time, not by user;
    *   - phase 2 reduces each (user, chunk) to its decimal total — rows
    *     bounded by users × chunks, never events — and a per-user window
    *     over CHUNK TOTALS yields each chunk's offset (sum of all prior
    *     chunks);
    *   - the stitch joins offsets back on (user, chunk), reusing phase
    *     1's partitioning, and emits offset + local prefix.
    *
    * Exactness: decimal addition is associative, so offset + local IS the
    * full-prefix sum — identical to [[runningSum]] bit-for-bit (the
    * reason w6 routes through decimal at all; a double fold would pin the
    * result to sequential evaluation order and no chunking could
    * reproduce it). Spec-proven on a planted hot-user gallery with
    * boundary-straddling events and on real data; shares w6's oracle.
    */
  def chunkedRunningSum(spark: SparkSession, dir: String,
      chunkUs: Long = 2L * 3600 * 1000 * 1000): DataFrame = {
    val byChunk = Window.partitionBy(col("user_id"), col("chunk"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        col("value").cast("decimal(18,6)").as("dval"))
      .withColumn("chunk", floor(col("us") / chunkUs))
    val locals = e.withColumn("local_run", sum(col("dval")).over(byChunk))
    val byUserChunks = Window.partitionBy(col("user_id")).orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = e.groupBy(col("user_id"), col("chunk"))
      .agg(sum(col("dval")).as("ctot"))
      .withColumn("off", sum(col("ctot")).over(byUserChunks))
      .select(col("user_id"), col("chunk"), col("off"))
    // null-safe on user_id: NULL users form one window partition in w6
    // (and in the shared oracle), so the stitch must carry them through —
    // a plain equi-join would silently drop every NULL-user event
    locals.join(offsets.withColumnsRenamed(
        Map("user_id" -> "o_user_id", "chunk" -> "o_chunk")),
        locals("user_id") <=> col("o_user_id") && locals("chunk") === col("o_chunk"))
      .select(col("event_id"), col("user_id"),
        round((col("local_run") + coalesce(col("off"), lit(0).cast("decimal(18,6)")))
          .cast("double"), 4).as("running_value"))
  }

  /** A18: ordered string aggregation (the LISTAGG/string_agg reporting
    * surface). `collect_list` is assembly-order-nondeterministic, so the
    * deterministic composition is sort_array ∘ collect_list ∘ array_join —
    * per-group member lists stay bounded by group size (here: nations per
    * region), never by table size.
    */
  def memberList(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("members"),
        count(lit(1)).as("n_members"))

  /** A19: UNPIVOT/melt — wide-to-long reshaping, the inverse of the a9
    * pivot. Uses the native `unpivot` (Expand under the hood: one pass,
    * no union of per-column scans).
    */
  def unpivotWidths(spark: SparkSession, dir: String): DataFrame =
    profileMaxLengths(spark, dir)
      .unpivot(Array.empty[org.apache.spark.sql.Column],
        Array(col("len_name"), col("len_brand"), col("len_type")),
        "metric", "len")

  /** A12 (itdbloader.py:170-178, 239-247): ingest profiler — max observed
    * width per string column, one aggregation pass over all columns.
    */
  def profileMaxLengths(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.agg(
      max(length(col("p_name"))).cast("long").as("len_name"),
      max(length(col("p_brand"))).cast("long").as("len_brand"),
      max(length(col("p_type"))).cast("long").as("len_type"))
  }

  /** A13 + X17 (itdbmetadata.py:10-11): JSON scalar extraction, MAX ...
    * GROUP BY ... HAVING. events.props is the JSON sidecar analogue.
    */
  def jsonMaxHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(get_json_object(col("props"), "$.k").cast("long")).as("max_k"))
      .filter(col("max_k") < 50)

  /** A14 (orphaned_files:114-129): grouped count, descending, threshold. */
  def groupThreshold(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("grp"), col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 3)
      .orderBy(col("n").desc, col("grp"), col("status"))

  // ---- Joins ----------------------------------------------------------

  /** J1/J6 (itdb.sql:117-118; restore_playlist.py:90-136): fact ⋈ broadcast
    * dimension + grouped rollup. part is the small side → explicit broadcast:
    * zero shuffle of lineitem at any scale.
    */
  def bridgeJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_partkey"), col("l_quantity"))
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(round(sum(col("l_quantity")), 4).as("sum_qty"), count(lit(1)).as("n"))
  }

  /** J2 (playlistlinks.py:164-175): join + literal playlist filter + explicit
    * column-list projection (P1). The filter lands on the dimension BEFORE
    * the join, so only matching orders are broadcast.
    */
  def joinLiteralFilter(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
    li.join(broadcast(o), li("l_orderkey") === o("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty"), col("l_extendedprice").as("price"))
  }

  /** J3 (itdbmetadata.py:8-11): left outer join preserving unmatched rows,
    * rolled up so missing-dimension rows are visible as a group.
    */
  def leftJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("NONE")).as("segment"))
      .agg(count(lit(1)).as("n"))
  }

  /** J4/F8 (itdbmetadata.py:128-133): NOT IN subquery → left anti join —
    * Spark's hash-based anti join replaces MySQL's per-row subquery probe.
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** J5 (playlistlinks.py:153-162): one-level hierarchy expansion
    * (folder → children), region→nation here. Both sides are tiny dims;
    * the join broadcasts.
    */
  def hierarchyExpand(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
    val n = Tables.nation(spark, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("r_name").as("parent"), col("n_name").as("child"))
  }

  /** J5b — folder-tree recursion as an iterative fixpoint, BEYOND the
    * reference's one-level expansion (playlistlinks.py:153-162 expands a
    * folder only to its direct children): the FULL ancestor→descendant
    * closure with depth, computed level-by-level until the frontier
    * empties. Folder tree synthesized deterministically from part —
    * folder k's parent is k div 4 (a 4-ary tree rooted at 0), so both
    * engines derive identical edges arithmetically.
    *
    * Scale shape: BFS frontier iteration, the d9 loop machinery — each
    * round ONE equi-join of the current frontier (rows at depth d)
    * against the edge table keyed on parent, `localCheckpoint` truncates
    * lineage so round N's plan doesn't replay rounds 1..N-1. Work per
    * round is linear in the frontier; rounds are bounded by tree DEPTH
    * (logarithmic for any branching factor > 1 — ~8 rounds at 100 TB),
    * unlike transitive-closure doubling whose intermediates go quadratic.
    * The edge table is repartitioned by parent once and persisted, so
    * every round's join reuses the same layout and only the (shrinking)
    * frontier shuffles.
    */
  def folderClosure(spark: SparkSession, dir: String, maxIter: Int = 40): DataFrame = {
    val edges = Tables.part(spark, dir)
      .filter(col("p_partkey") >= 1)
      .select(expr("p_partkey div 4").as("parent"), col("p_partkey").as("child"))
      .repartition(col("parent"))
      .persist()
    var frontier = edges
      .select(col("parent").as("anc"), col("child").as("dsc"), lit(1L).as("depth"))
      .localCheckpoint()
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var it = 0
    var growing = true
    while (growing && it < maxIter) {
      val next = frontier.join(edges, frontier("dsc") === edges("parent"))
        .select(frontier("anc"), edges("child").as("dsc"),
          (frontier("depth") + 1L).as("depth"))
        .localCheckpoint()
      if (next.isEmpty) growing = false
      else { levels += next; frontier = next }
      it += 1
    }
    edges.unpersist()
    levels.reduce(_ unionByName _)
  }

  /** G1: PAGERANK over the hierarchy edge set — the iterative
    * fixed-point computation family beyond reachability ([[folderClosure]]
    * is the BFS fixpoint; this is the value-propagation one). The curation
    * relevance is authority scoring: web-corpus pipelines rank hosts by
    * link centrality (PageRank/harmonic à la Common Crawl) as a document
    * quality prior, exactly this shape over the host graph.
    *
    * INTEGER-EXACT by construction so a SQL oracle replays it bit-for-bit:
    * ranks carry a 10^12 fixed-point scale, the damped contribution is
    * `(pr * 85) div (outdeg * 100)` (integer div, positive operands —
    * truncation == floor in both engines), and inflow sums are exact
    * longs. No float ever appears, so no fold-order or libm drift can
    * split the engines (the t18 integer-surprisal discipline applied to an
    * iterative kernel). On the tree's unit in-degree the rank is bounded
    * by the scale itself, so 64-bit arithmetic cannot overflow at any
    * corpus size. Dangling leaves simply retain their teleport share
    * (classic non-redistributing PageRank), deterministic and replayed by
    * the oracle.
    *
    * Scale shape: the (edge ⋈ outdeg) frame and the node universe are
    * session-persisted once per dir ([[folderClosure]]'s layout — at
    * 100 TB a bucketed table); each of the FIXED `iters` rounds is one
    * equi-join (ranks ⋈ edges on the partitioning key) plus one
    * child-keyed aggregation — never a cartesian, never driver-side
    * state. A SHORT fixed iteration stays one declarative plan (one
    * action, Catalyst pipelines the rounds); past `checkpointEvery`
    * rounds the loop truncates lineage with `localCheckpoint` exactly as
    * the closure operators do, so deep iteration counts cannot blow up
    * the plan.
    */
  private val PrScale = 1000000000000L

  /** The hierarchy edge set (parent = key div 4) over an optional key
    * predicate — shared by the cold and incremental PageRank tiers.
    */
  private def pagerankEdges(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") >= 1)
      .select(expr("p_partkey div 4").as("parent"), col("p_partkey").as("child"))

  /** (edge ⋈ outdeg, node universe) for an edge frame, both persisted —
    * callers unpersist or session-cache as their lifetime requires.
    */
  private def pagerankGraph(edges: DataFrame): (DataFrame, DataFrame) = {
    val part = edges.repartition(col("parent"))
    val eo = part.join(
      part.groupBy(col("parent")).agg(count(lit(1)).as("outdeg")), Seq("parent"))
      .persist()
    val nodes = part.select(col("parent").as("node"))
      .unionByName(part.select(col("child").as("node")))
      .distinct().persist()
    (eo, nodes)
  }

  /** The damped-propagation loop shared by [[pagerank]] (cold init) and
    * [[deltaPagerank]] (warm start): `iters` rounds of one equi-join +
    * one child-keyed aggregation, all integer arithmetic (see
    * [[pagerank]]'s scaladoc for the exactness argument).
    */
  private def pagerankRounds(nodes: DataFrame, eo: DataFrame,
      init: DataFrame, iters: Int, checkpointEvery: Int = 4): DataFrame = {
    var pr = init
    (1 to iters).foreach { i =>
      val inflow = pr.join(eo, pr("node") === eo("parent"))
        .select(col("child").as("node"),
          expr("(pr * 85L) div (outdeg * 100L)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).cast("long").as("inflow"))
      pr = nodes.join(inflow, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(15L * PrScale / 100) + coalesce(col("inflow"), lit(0L))).as("pr"))
      if (i % checkpointEvery == 0 && i < iters) pr = pr.localCheckpoint()
    }
    pr
  }

  def pagerank(spark: SparkSession, dir: String, iters: Int = 3,
      checkpointEvery: Int = 4): DataFrame = {
    val (eo, nodes) = graft.SessionCache.getOrElseUpdate(
        spark, ("pagerankEdges", dir)) {
      pagerankGraph(pagerankEdges(spark, dir))
    }
    pagerankRounds(nodes, eo,
      nodes.select(col("node"), lit(PrScale).as("pr")), iters, checkpointEvery)
  }

  /** G1b: INCREMENTAL PageRank — the graph family's ingest twin (every
    * dedup/ANN/sketch family carries one; value propagation now does
    * too). The serving state is the persisted BASE rank vector: ranks
    * over the base edge slice (md5-bucket(child) < `newFrom`, the t9
    * split convention) after `itersBase` rounds, written through the
    * real disk path once per (session, dir). When a shard of new edges
    * arrives, the ranks WARM-START from that vector — known nodes load
    * their converged base rank, unseen nodes the cold init — and run
    * only `itersDelta` rounds over the grown graph, the standard
    * incremental-PageRank restart (the previous solution is a better
    * starting point than uniform, so fewer rounds re-converge; here the
    * round counts are FIXED so the whole trajectory — base rounds, then
    * warm rounds — is integer-exact and the oracle replays all six).
    *
    * Scale: the delta pays itersDelta joins over the grown graph instead
    * of a from-scratch iteration to convergence; the base vector loads
    * as a bucketable table and the warm-start join is node-keyed.
    */
  def deltaPagerank(spark: SparkSession, dir: String, newFrom: Int = 200,
      itersBase: Int = 3, itersDelta: Int = 3): DataFrame = {
    // itersBase shapes the persisted vector, so it is part of BOTH the
    // cache key and the table name (the threshold-key lesson from the
    // round-9 advice: a param that changes saved state must key it)
    val rankTable = graft.SessionCache.getOrElseUpdate(
        spark, ("pagerankBase", dir, newFrom, itersBase)) {
      val t = f"pagerank_base_${newFrom}_${itersBase}_${dir.hashCode & 0xffffffffL}%x"
      Dedup.dropTableAndLocation(spark, t)
      val (eoB, nodesB) = pagerankGraph(pagerankEdges(spark, dir)
        .filter(TextAnalysis.splitBucket(col("child")) < newFrom))
      pagerankRounds(nodesB, eoB,
        nodesB.select(col("node"), lit(PrScale).as("pr")), itersBase)
        .write.saveAsTable(t)
      eoB.unpersist(); nodesB.unpersist()
      t
    }
    val (eo, nodes) = graft.SessionCache.getOrElseUpdate(
        spark, ("pagerankEdges", dir)) {
      pagerankGraph(pagerankEdges(spark, dir))
    }
    val warm = nodes.join(
        spark.table(rankTable).withColumnRenamed("pr", "base_pr"),
        Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("base_pr"), lit(PrScale)).as("pr"))
    pagerankRounds(nodes, eo, warm, itersDelta)
  }

  /** Pointer-doubling variant of [[folderClosure]]: round k extends only
    * the depth == 2^(k-1) slice of the accumulated closure by ALL known
    * pairs (depths ≤ 2^(k-1)), producing depths 2^(k-1)+1 .. 2^k. The
    * split point — the ancestor exactly 2^(k-1) levels down the unique
    * tree path — is unique per (anc, dsc), so no duplicate pairs arise
    * and no distinct is needed. Rounds are O(log depth) instead of
    * O(depth): at cluster scale the per-round BARRIER (a full job +
    * lineage checkpoint) dominates a deep hierarchy's wall time, and 4
    * rounds beat 16 even though each joins the larger accumulated
    * closure. Output identical to [[folderClosure]] (spec-proven).
    */
  def folderClosureDoubling(spark: SparkSession, dir: String,
      maxRounds: Int = 20): DataFrame = {
    val edges = Tables.part(spark, dir)
      .filter(col("p_partkey") >= 1)
      .select(expr("p_partkey div 4").as("parent"), col("p_partkey").as("child"))
    var c = edges
      .select(col("parent").as("anc"), col("child").as("dsc"), lit(1L).as("depth"))
      .localCheckpoint()
    var step = 1L
    var rounds = 0
    var growing = true
    while (growing && rounds < maxRounds) {
      val slice = c.filter(col("depth") === step)
        .select(col("anc"), col("dsc").as("mid"))
      val ext = c.select(col("anc").as("mid"), col("dsc").as("dsc2"),
        col("depth").as("d2"))
      val next = slice.join(ext, Seq("mid"))
        .select(col("anc"), col("dsc2").as("dsc"), (col("d2") + step).as("depth"))
        .localCheckpoint()
      if (next.isEmpty) growing = false
      else { c = c.unionByName(next).localCheckpoint(); step *= 2 }
      rounds += 1
    }
    c
  }

  /** J8 + X14 (dedup.py:146-171): similar-name candidate generation via
    * explode of deterministic variants, then self-join. The generator is a
    * codegen'd transform/explode (no custom Generator, SURVEY §2.9).
    * Variant rule mirrors the reference: a name and its " N"-suffixed forms
    * collide on the same candidate key.
    */
  def similarNameJoin(spark: SparkSession, dir: String): DataFrame = {
    // key-capped so the synthetic vocabulary's name collisions don't grow
    // quadratically with SF; the operator shape is what's exercised
    val p = Tables.part(spark, dir)
      .filter(col("p_partkey") < 500)
      .select(col("p_partkey"), col("p_name"))
    // candidate key = name with any trailing " <digit>" stripped
    val withKey = p.withColumn("ckey", regexp_replace(col("p_name"), " \\d$", ""))
    val a = withKey.select(col("p_partkey").as("key_a"), col("p_name").as("name_a"), col("ckey"))
    val b = withKey.select(col("p_partkey").as("key_b"), col("p_name").as("name_b"), col("ckey"))
    a.join(b, Seq("ckey"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"))
  }

  /** J8b: HAMMING SIMILARITY JOIN with PIGEONHOLE-EXACT blocking — the
    * string-similarity join (PassJoin-family idea, Li et al.) that j8's
    * normalized-key join cannot express: pair equal-length names
    * differing in at most `maxDist` character positions, wherever those
    * positions fall. The blocking is exact by pigeonhole: split each
    * string into `maxDist + 1` contiguous segments (boundaries a pure
    * function of LENGTH, so equal-length strings align) — `maxDist`
    * mismatches can touch at most `maxDist` segments, so every
    * qualifying pair agrees exactly on at least one (len, segment index,
    * segment value) key. Candidates form ONLY inside those blocks (an
    * equi join — never a quadratic name scan), then the exact Hamming
    * distance verifies; recall is 1.0 by construction, not a tuning
    * outcome. Very short strings (length ≤ maxDist) make some segments
    * empty — their block key degrades to (len, idx, ""), still bounded
    * by the per-length name count.
    *
    * The oracle states the join DECLARATIVELY (quadratic with DuckDB's
    * `mismatches`); the Spark side must reproduce it through the
    * segment blocks — the same declarative-vs-rewrite gate discipline
    * as the w5 range join.
    */
  def hammingJoin(spark: SparkSession, dir: String, maxDist: Int = 2): DataFrame =
    hammingJoinOf(Tables.part(spark, dir)
      .filter(col("p_partkey") < 500)
      .select(col("p_partkey").as("key"), col("p_name").as("name")), maxDist)

  /** [[hammingJoin]] over an explicit (key, name) frame — the planted-
    * fixture / property-test surface.
    */
  def hammingJoinOf(names: DataFrame, maxDist: Int = 2): DataFrame = {
    val p = names.withColumn("len", length(col("name")))
    val nSegs = maxDist + 1
    // segment i spans [i*len/nSegs, (i+1)*len/nSegs) — integer div on the
    // length keeps boundaries engine-free and alignment exact per length
    val segs = p.select(col("key"), col("name"), col("len"),
      explode(array((0 until nSegs).map { i =>
        struct(lit(i).as("seg_idx"),
          expr(s"substring(name, CAST(len * $i div $nSegs AS INT) + 1, " +
            s"CAST(len * ${i + 1} div $nSegs AS INT) - CAST(len * $i div $nSegs AS INT))")
            .as("seg"))
      }: _*)).as("s"))
      .select(col("key"), col("name"), col("len"),
        col("s.seg_idx").as("seg_idx"), col("s.seg").as("seg"))
    val a = segs.select(col("len"), col("seg_idx"), col("seg"),
      col("key").as("key_a"), col("name").as("name_a"))
    val b = segs.select(col("len"), col("seg_idx"), col("seg"),
      col("key").as("key_b"), col("name").as("name_b"))
    val ham = size(filter(
      zip_with(split(col("name_a"), ""), split(col("name_b"), ""),
        (x, y) => x =!= y),
      m => m))
    a.join(b, Seq("len", "seg_idx", "seg"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"))
      .distinct()
      .withColumn("hamming", ham.cast("long"))
      .filter(col("hamming") <= maxDist)
  }

  /** J8c: EDIT-DISTANCE similarity join — [[hammingJoin]] with the
    * equal-length restriction lifted (PassJoin, Li/Deng/Feng 2011):
    * pair names within Levenshtein distance `maxDist`, insertions and
    * deletions included. Blocking is again pigeonhole-EXACT:
    *
    *   - the r-role of each string splits into maxDist+1 contiguous
    *     segments (boundaries a pure function of its length);
    *   - the s-role generates, for each segment index i and each
    *     candidate r-length L within ±maxDist of its own, the substrings
    *     of the segment-i length whose start lies within ±maxDist of the
    *     segment-i start — in an optimal alignment with ≤ maxDist edits,
    *     some segment is error-free and its image in s is an exact copy
    *     shifted by at most the net indel balance (≤ maxDist), so every
    *     qualifying pair meets in at least one (L, i, substring) block;
    *   - candidates dedup, then the exact Levenshtein verifies (Spark
    *     and DuckDB implement the same unit-cost DP, so the distance
    *     itself ships in the output).
    *
    * The generation factor is a CONSTANT ((maxDist+1)·(2·maxDist+1)²
    * = 75 at maxDist 2) per row — never a quadratic scan; block sizes
    * are bounded by per-(L, i, substring) collision counts exactly as in
    * j8b. The oracle states the join declaratively (quadratic
    * `levenshtein`), the Spark side must reproduce it through the
    * blocks.
    */
  def editDistanceJoin(spark: SparkSession, dir: String, maxDist: Int = 2): DataFrame =
    editDistanceJoinOf(Tables.part(spark, dir)
      .filter(col("p_partkey") < 500)
      .select(col("p_partkey").as("key"), col("p_name").as("name")), maxDist)

  /** [[editDistanceJoin]] over an explicit (key, name) frame — the
    * planted-fixture / property-test surface.
    */
  def editDistanceJoinOf(names: DataFrame, maxDist: Int = 2): DataFrame = {
    val nSegs = maxDist + 1
    val p = names.withColumn("len", length(col("name")))
    val segSide = p.select(col("key").as("key_r"), col("name").as("name_r"),
      col("len").as("ll"),
      explode(array((0 until nSegs).map { i =>
        struct(lit(i).as("i"),
          expr(s"substring(name, CAST(len * $i div $nSegs AS INT) + 1, " +
            s"CAST(len * ${i + 1} div $nSegs AS INT) - CAST(len * $i div $nSegs AS INT))")
            .as("seg"))
      }: _*)).as("s"))
      .select(col("key_r"), col("name_r"), col("ll"),
        col("s.i").as("i"), col("s.seg").as("seg"))
    // s-role: one candidate per (segment index, r-length delta, start
    // shift), dropped when the window falls outside the string.
    // slen == 0 (hence L == 0) candidates MUST stay in: a string of
    // length <= maxDist has empty segments, and a qualifying pair may
    // meet ONLY on one of them (e.g. ("ab","xy") at maxDist 2 — both
    // 1-char segments carry an edit; the error-free segment is the
    // empty seg0). Empty segments exist only for L <= maxDist, so the
    // ("", i, L) blocks join a stratum bounded by len <= 2*maxDist.
    //
    // The (i, dL, dq) grid is a LITERAL ARRAY exploded into rows with ONE
    // substring expression after the explode — not (pre-round-21)
    // nSegs·(2·maxDist+1)² parallel expression trees per row: that
    // 75-expression projection cost ~1 s of analyzer/optimizer time on
    // EVERY pass (wall 1.9 s vs 0.86 s of job time — guide §7.3's
    // planning-dominated signature). The candidate SET per name is
    // unchanged (the old array_distinct only collapsed duplicate
    // (i, ll, sub) triples, which the pair-level distinct() below
    // already absorbs), so the output is identical.
    val grid = array((for {
      i <- 0 until nSegs; dL <- -maxDist to maxDist; dq <- -maxDist to maxDist
    } yield struct(lit(i).as("i"), lit(dL).as("dl"), lit(dq).as("dq"))): _*)
    val candSide = p.select(col("key").as("key_s"), col("name").as("name_s"),
        col("len"), explode(grid).as("t"))
      .select(col("key_s"), col("name_s"), col("len"),
        col("t.i").as("i"),
        (col("len") + col("t.dl")).cast("int").as("ll"),
        col("t.dq").as("dq"))
      .withColumn("p0", expr(s"ll * i div $nSegs"))
      .withColumn("slen", expr(s"ll * (i + 1) div $nSegs") - col("p0"))
      .withColumn("q", col("p0") + col("dq"))
      .filter(col("ll") >= 0 && col("slen") >= 0 && col("q") >= 0 &&
        col("q") + col("slen") <= col("len"))
      .select(col("key_s"), col("name_s"), col("i"), col("ll"),
        expr("substring(name_s, CAST(q AS INT) + 1, CAST(slen AS INT))")
          .as("seg"))
    val dist = levenshtein(col("name_a"), col("name_b"))
    segSide.join(candSide, Seq("ll", "i", "seg"))
      .filter(col("key_r") =!= col("key_s"))
      .select(least(col("key_r"), col("key_s")).as("key_a"),
        greatest(col("key_r"), col("key_s")).as("key_b"),
        when(col("key_r") < col("key_s"), col("name_r")).otherwise(col("name_s")).as("name_a"),
        when(col("key_r") < col("key_s"), col("name_s")).otherwise(col("name_r")).as("name_b"))
      .distinct()
      .withColumn("distance", dist.cast("long"))
      .filter(col("distance") <= maxDist)
  }

  // ---- Filters --------------------------------------------------------

  /** F3 (playlistlinks.py:139-144): LIKE pattern filter. */
  def likeFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_type").like("%OM%"))
      .select(col("p_partkey"), col("p_type"))

  /** F4 (README.md:146 REGEXP BINARY): case-sensitive regex filter —
    * rlike is case-sensitive by default, matching MySQL's BINARY modifier.
    */
  def regexFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").rlike("^[a-z]+ (ring|bolt|gear)$"))
      .select(col("p_partkey"), col("p_name"))

  /** F5 (itdb2html.py:295-296): null/empty guard. */
  def nullGuard(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull && length(col("text")) =!= 0)
      .agg(count(lit(1)).as("n_nonempty"))

  /** F6 (itdbmetadata.py:130): boolean OR predicate. */
  def boolOrFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F" || col("o_orderpriority").like("1%"))
      .agg(count(lit(1)).as("n"))

  /** F7 (itdb2html.py:516-517): filter on a derived star value. */
  def derivedFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(starsFromDiscount(col("l_discount")) === 3)
      .agg(count(lit(1)).as("n"), round(exactSum(col("l_extendedprice")), 2).as("sum_price"))

  // ---- Sorts / top-k / windows ---------------------------------------

  /** O1 (itdb2html.py:331-336): ordered projection. */
  def sortedProjection(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_name"), col("p_retailprice"))
      .orderBy(col("p_name"), col("p_retailprice"))

  /** O4/W2 (itdb2html.py:445-458 `shrink`): two-phase top-k — sort by total
    * ascending, truncate to 2k, re-sort by quality desc, truncate to k.
    * Fully tie-broken so results are deterministic (SURVEY §7.4).
    */
  def shrinkTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val perBrand = Tables.part(spark, dir)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("total"),
        round(exactSum(col("p_retailprice")) / count(lit(1)), 4).as("avg_price"))
    perBrand.orderBy(col("total").asc, col("p_brand")).limit(2 * k)
      .orderBy(col("avg_price").desc, col("p_brand")).limit(k)
  }

  /** O5 (playlistlinks.py:186-189 random.shuffle): deterministic shuffle —
    * seeded by hashing the key (portable md5, not engine-local rand) so the
    * "random" order is reproducible across engines and re-runs.
    */
  def deterministicShuffle(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .withColumn("shuffle_key", md5(col("p_partkey").cast("string")))
      .orderBy(col("shuffle_key"))
      .limit(20)
      .select(col("p_partkey"), col("p_name"), col("shuffle_key"))

  /** AS-OF join — the time-series operator Spark has no native form of
    * (SURVEY §2 custom-operator bucket, preference (a): compose existing
    * ops). For each left-side event, attach the LATEST right-side event of
    * the same key at-or-before its timestamp. Composition: union-tag both
    * sides, ONE shuffle on the key, one per-key ordered window, and
    * `last(_, ignoreNulls)` carries the most recent right-side attributes
    * forward to each left row. Ordering (ts, is_right desc, event_id)
    * makes an equal-timestamp right row eligible (ASOF `<=` semantics)
    * and breaks duplicate-timestamp ties deterministically by the highest
    * event_id. At 100 TB this is the plan you want: partition by key
    * (bucketed storage co-locates it), sort within partitions, no
    * per-row probing and no range cross-join blowup.
    */
  def asofJoin(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    // the right side is pre-aggregated to ONE row per (user, ts) — the
    // highest-event_id row's attributes win (max_by), which (a) makes the
    // duplicate-timestamp tiebreak expressible in the oracle (arg_max) and
    // (b) shrinks the right side before the shuffle. NULL-key right rows
    // are dropped: join equality never matches NULL, so a NULL-key left
    // row must surface NULL attributes, not another NULL-key row's.
    val rights = events.filter(col("event_type") === rightType)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("value"),
        max(col("event_id")).as("event_id"))
      .select(col("event_id"), col("ts"), col("user_id"),
        lit(rightType).as("event_type"), col("value"))
    val lefts = events.filter(col("event_type") === leftType)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val tagged = lefts.unionByName(rights)
      .withColumn("is_right", (col("event_type") === rightType).cast("int"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_right").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct through the window: ts and value always come from the
    // SAME matched row (two independent last() calls would stitch a
    // non-null value from an older row onto a newer row's ts whenever the
    // newest right row carries a NULL value)
    tagged
      .withColumn("right_row",
        last(when(col("is_right") === 1,
          struct(col("ts").as("ts"), col("value").as("value"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === leftType)
      .withColumn("right_ts", col("right_row.ts"))
      .withColumn("right_value", col("right_row.value"))
      .drop("right_row")
  }

  /** Gate form: each click joined to the user's most recent prior (or
    * simultaneous) view. Timestamps emitted as epoch micros — the
    * engine-neutral representation (generator values are micro-aligned).
    */
  def clickAsofView(spark: SparkSession, dir: String): DataFrame =
    asofJoin(Tables.events(spark, dir), "click", "view")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("click_us"),
        unix_micros(col("right_ts")).as("view_us"),
        col("right_value").as("view_value"))

  /** W4's SKEW-HARDENED twin — the chunk decomposition for the AS-OF
    * carry (the last of the w-family's single-task-per-user exposures,
    * after w7b/w6b/w10b). The carried right row can lie arbitrarily far
    * back, so unlike w10b no bounded ghost exchange suffices; instead the
    * carry itself is two-phase:
    *
    *   - phase 1 runs the exact w4 tagged window per (user, time-chunk):
    *     left rows whose match lives in their own chunk are done; the
    *     rest surface a NULL local carry;
    *   - phase 2 reduces each (user, chunk) to its LAST right row (one
    *     summary per chunk — max_by on the (ts, event_id) order, which is
    *     total because the right side is pre-deduplicated per (user,
    *     ts)), then a per-user window over CHUNK SUMMARIES — rows bounded
    *     by chunks, never events — computes each chunk's carry-in: the
    *     latest right row strictly before the chunk;
    *   - the stitch joins carry-ins back on (user, chunk) and takes
    *     coalesce(local, carry_in).
    *
    * Exactness: a left row's as-of match is in its own chunk (phase 1
    * finds it, equal-ts ties included — same ts ⇒ same chunk) or in a
    * prior chunk, in which case the local carry is NULL and the match is
    * by definition the last right row of the preceding chunks = the
    * carry-in. Identical output to [[asofJoin]] (spec-proven on a planted
    * gallery and real data); shares w4's oracle.
    */
  def asofJoinChunked(events: DataFrame, leftType: String, rightType: String,
      chunkUs: Long = 6L * 3600 * 1000 * 1000): DataFrame = {
    val rights = events.filter(col("event_type") === rightType)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("value"),
        max(col("event_id")).as("event_id"))
      .select(col("event_id"), col("ts"), col("user_id"),
        lit(rightType).as("event_type"), col("value"))
    val lefts = events.filter(col("event_type") === leftType)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val tagged = lefts.unionByName(rights)
      .withColumn("is_right", (col("event_type") === rightType).cast("int"))
      .withColumn("chunk", floor(unix_micros(col("ts")) / chunkUs))
    val wChunk = Window.partitionBy(col("user_id"), col("chunk"))
      .orderBy(col("ts"), col("is_right").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localized = tagged.withColumn("local_right",
      last(when(col("is_right") === 1,
        struct(col("ts").as("ts"), col("value").as("value"))),
        ignoreNulls = true).over(wChunk))
    // one summary row per (user, chunk): the chunk's last right row
    val summaries = tagged.filter(col("is_right") === 1)
      .groupBy(col("user_id"), col("chunk"))
      .agg(max_by(struct(col("ts").as("ts"), col("value").as("value")),
        struct(col("ts"), col("event_id"))).as("chunk_last"))
    // carry-in per populated (user, chunk): last summary of PRIOR chunks
    val wPrior = Window.partitionBy(col("user_id")).orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = tagged.select(col("user_id"), col("chunk")).distinct()
      .join(summaries, Seq("user_id", "chunk"), "left_outer")
      .withColumn("carry_in", last(col("chunk_last"), ignoreNulls = true).over(wPrior))
      .select(col("user_id"), col("chunk"), col("carry_in"))
    // LEFT OUTER: a NULL-user_id left row never equi-matches the carry
    // frame but must still surface (with NULL attributes), exactly as the
    // plain window form emits it
    localized.join(carries, Seq("user_id", "chunk"), "left_outer")
      .withColumn("right_row", coalesce(col("local_right"), col("carry_in")))
      .filter(col("event_type") === leftType)
      .withColumn("right_ts", col("right_row.ts"))
      .withColumn("right_value", col("right_row.value"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("right_ts"), col("right_value"))
  }

  /** [[clickAsofView]] answered through the chunked as-of — shares w4's
    * oracle (identical output by the exactness argument above).
    */
  def clickAsofViewChunked(spark: SparkSession, dir: String): DataFrame =
    asofJoinChunked(Tables.events(spark, dir), "click", "view")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("click_us"),
        unix_micros(col("right_ts")).as("view_us"),
        col("right_value").as("view_value"))

  /** RANGE join — the second custom time-series operator (SURVEY §2
    * custom-operator bucket, compose-first): pair events of two types for
    * the same key whose timestamps fall within ±window of each other.
    * A naive inequality join degenerates to a per-key cross join; the
    * scale composition BINS the time axis at the window size, explodes
    * each left row to its 3 candidate bins, EQUI-joins on (key, bin) —
    * two events within the window are never more than one bin apart, and
    * each right row lives in exactly one bin so no pair is produced twice
    * — then applies the exact range predicate to the bounded candidates.
    * Shuffle keys are (user, bin): uniform, skew-safe, and the candidate
    * count per task is bounded by per-key event density in one window,
    * not by total key cardinality.
    */
  def rangeJoinCounts(spark: SparkSession, dir: String,
      leftType: String = "error", rightType: String = "click",
      windowUs: Long = 5L * 60 * 1000 * 1000): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"))
    val left = e.filter(col("event_type") === leftType)
      .withColumn("bin0", floor(col("us") / windowUs))
      .withColumn("bin", explode(array(col("bin0") - 1, col("bin0"), col("bin0") + 1)))
      .select(col("event_id").as("left_id"), col("us").as("left_us"),
        col("user_id"), col("bin"))
    val right = e.filter(col("event_type") === rightType)
      .withColumn("bin", floor(col("us") / windowUs))
      .select(col("event_id").as("right_id"), col("us").as("right_us"),
        col("user_id"), col("bin"))
    // LEFT OUTER with the exact range predicate in the join condition:
    // every exploded left row survives (unmatched → NULL right_id), so
    // count(right_id) gives zero-match lefts their 0 without a second
    // scan or re-entry join; each genuine match still counts exactly once
    // (one bin per right row)
    left.join(right,
        left("user_id") === right("user_id") && left("bin") === right("bin") &&
          abs(left("left_us") - right("right_us")) <= windowUs,
        "left_outer")
      .groupBy(col("left_id")).agg(count(col("right_id")).as("n_matched"))
  }

  /** W7: gap-based batch SESSIONIZATION — the batch twin of the streaming
    * flatMapGroupsWithState sessionizer (streaming/EventsStream.scala): an
    * event starts a new session when more than `gapUs` elapsed since the
    * user's previous event. Classic two-window composition: lag marks
    * session starts, a running sum of the marks numbers the sessions, then
    * one aggregation rolls each (user, session) up to its stats. Both
    * windows share the per-user partitioning, so the sort is per-key and
    * distributed (ONE shuffle on user_id serves the lag, the running sum
    * and the final aggregation — no global ordering anywhere). The money
    * sum routes through decimal so the fold is order-independent and
    * engine-exact (SURVEY §7.4).
    */
  def sessionize(spark: SparkSession, dir: String,
      gapUs: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(running))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"),
        (max(col("us")) - min(col("us"))).as("duration_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")).cast("double"), 4).as("sum_value"))
  }

  /** W7's SKEW-HARDENED twin: identical output to [[sessionize]] through a
    * time-chunked two-phase plan. The w-family's scale exposure is the one
    * shape joins can salt but windows cannot: every event of a user flows
    * through ONE task because order matters, so a single pathological user
    * (a bot emitting millions of events) is a straggler no AQE setting
    * fixes. The chunked plan bounds per-task work by TIME, not by user:
    *
    *   - phase 1 partitions by (user, floor(us/chunkUs)) — a hot user
    *     spreads over all its chunks — and runs the exact w7 lag/running-
    *     sum composition WITHIN each chunk, rolling up per-chunk local
    *     sessions (start, end, n, decimal value sum, unrounded);
    *   - phase 2 shuffles only the LOCAL-SESSION summaries per user —
    *     bounded by chunks + true sessions, never raw events (a dense bot
    *     collapses to ~1 row per chunk) — and re-runs the same gap logic
    *     over (prev end, next start) to stitch sessions across chunk
    *     boundaries, including sessions spanning many (or empty) chunks.
    *
    * Exactness: a session boundary exists between consecutive events iff
    * their gap exceeds gapUs. Phase 1 finds every boundary except those
    * between chunk-adjacent events; for two consecutive local sessions the
    * stitch gap (next.start − prev.end) IS the inter-event gap phase 1
    * could not see (inside one chunk it is a gap phase 1 already split
    * on, hence > gapUs and never merged), so phase 2's identical
    * lag/running-sum recovers exactly w7's boundaries and numbering.
    * Value sums stay decimal (associative-exact) until the final round,
    * so even the doubles match bit-for-bit — spec-proven identical on a
    * planted skew gallery and real data, at chunk sizes above AND below
    * the gap. Same composition as t14's date-sharded stream key, applied
    * to the batch window family.
    */
  def chunkedSessionize(spark: SparkSession, dir: String,
      gapUs: Long = 30L * 60 * 1000 * 1000,
      chunkUs: Long = 2L * 3600 * 1000 * 1000): DataFrame = {
    val byChunk = Window.partitionBy(col("user_id"), col("chunk"))
      .orderBy(col("us"), col("event_id"))
    val runningChunk = byChunk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val locals = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("chunk", floor(col("us") / chunkUs))
      .withColumn("prev_us", lag(col("us"), 1).over(byChunk))
      .withColumn("new_local",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("local_idx", sum(col("new_local")).over(runningChunk))
      .groupBy(col("user_id"), col("chunk"), col("local_idx"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("dec_value"))
    // local sessions of one user never share a start (same us ⇒ same
    // chunk ⇒ same local session), so start_us alone is a total order
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("start_us"))
    val runningUser = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    locals
      .withColumn("prev_end", lag(col("end_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_end").isNull || col("start_us") - col("prev_end") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(runningUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("start_us")).as("start_us"), max(col("end_us")).as("end_us"),
        (max(col("end_us")) - min(col("start_us"))).as("duration_us"),
        sum(col("n_events")).as("n_events"),
        round(sum(col("dec_value")).cast("double"), 4).as("sum_value"))
  }

  /** W10: VALUE-RANGE rolling window — trailing-hour BURST detection per
    * user (rate spikes for abuse/anomaly triage): at each event, count the
    * user's events in the preceding `windowUs` (inclusive of now,
    * exclusive of exactly one window ago), then roll up each user's peak.
    * The frame is RANGE (value-based) over integer epoch-micros, so
    * same-timestamp events are frame PEERS in both engines and the result
    * is deterministic under any tie order — the property a ROWS frame
    * would not have. Same scale shape as every w-op: ONE user-keyed
    * shuffle, per-user sort, frame state bounded by one window's event
    * density.
    */
  def burstDetection(spark: SparkSession, dir: String,
      windowUs: Long = 3600L * 1000 * 1000): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-(windowUs - 1), Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("burst", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("burst")).cast("long").as("peak_burst"),
        count(lit(1)).as("n_events"))
  }

  /** W10's SKEW-HARDENED twin — the chunk decomposition for a TRAILING
    * RANGE window (round-10 verdict ask #5's second half). A trailing
    * frame only ever reads `windowUs` of history, so per-(user, chunk)
    * evaluation is exact once each chunk can also see the final
    * `windowUs` of its predecessor — the boundary-event exchange:
    *
    *   - every event lands in its own chunk (floor(us/chunkUs));
    *   - events in a chunk's last windowUs−1 micros are DUPLICATED into
    *     the next chunk as ghosts (context rows, never emitted) — the
    *     duplication factor is windowUs/chunkUs (≈1/6 at the defaults),
    *     and with chunkUs ≥ windowUs one predecessor suffices;
    *   - the same RANGE frame runs per (user, chunk) over own + ghost
    *     rows; ghosts fill exactly the history a chunk-initial event's
    *     frame would otherwise miss, so every own row's count equals the
    *     global computation's — integer counts, no fold-order caveat;
    *   - ghosts are dropped, then the per-user peak rollup is unchanged.
    *
    * Per-task work is bounded by (user, time-chunk) event density; a bot
    * user spreads over all its chunks. Identical output to
    * [[burstDetection]] by the argument above (spec-proven on a planted
    * gallery with boundary-straddling bursts); shares w10's oracle.
    */
  def chunkedBurstDetection(spark: SparkSession, dir: String,
      windowUs: Long = 3600L * 1000 * 1000,
      chunkUs: Long = 6L * 3600 * 1000 * 1000): DataFrame = {
    require(chunkUs >= windowUs, "a chunk must cover the trailing window")
    val e = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val own = e.withColumn("chunk", floor(col("us") / chunkUs))
      .withColumn("is_ghost", lit(false))
    val ghosts = e.filter(pmod(col("us"), lit(chunkUs)) >= chunkUs - (windowUs - 1))
      .withColumn("chunk", floor(col("us") / chunkUs) + 1)
      .withColumn("is_ghost", lit(true))
    val w = Window.partitionBy(col("user_id"), col("chunk")).orderBy(col("us"))
      .rangeBetween(-(windowUs - 1), Window.currentRow)
    own.unionByName(ghosts)
      .withColumn("burst", count(lit(1)).over(w))
      .filter(!col("is_ghost"))
      .groupBy(col("user_id"))
      .agg(max(col("burst")).cast("long").as("peak_burst"),
        count(lit(1)).as("n_events"))
  }

  /** W8: NTILE bucketing — the quantile-bucket window surface (deciles /
    * quartiles for reporting and length-balanced sharding). Partitioned by
    * group so the sort is per-key and distributed — never a global ntile
    * (which would funnel the table through one task); the total order
    * (price, orderkey) makes bucket boundaries deterministic on ties, so
    * both engines cut identical quartiles.
    */
  def priorityQuartiles(spark: SparkSession, dir: String, buckets: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(buckets).over(w).cast("long"))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
  }

  /** O6/W3 (playlistlinks.py:212-221): per-group sequence numbering. */
  def rowNumbering(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).as("rn"))
  }

  /** W1 (dupes/finddupes.py:10-18): adjacent-duplicate count on the
    * value-sorted stream, computed DISTRIBUTED: each equal-value run of
    * length c contributes c-1 adjacent pairs, so
    * n_adjacent_dups == count(value) - count(DISTINCT value)
    * (count(value) ignores nulls, matching the lag form where NULL = NULL
    * never compares true). One partial-aggregated shuffle on `value`,
    * no global sort, no single-task window — this is the 100 TB plan.
    * `adjacentDuplicatesWindow` below is the literal lag-window surface
    * proof, asserted equal in ExprsSpec.
    */
  def adjacentDuplicates(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg((count(col("value")) - countDistinct(col("value"))).as("n_adjacent_dups"))

  /** W1 surface form: lag over a totally-ordered window. Correct but funnels
    * all rows through ONE task (no partition key) — kept for the unit-test
    * identity proof and small ordered streams only; the gate query ships the
    * distributed identity above.
    */
  def adjacentDuplicatesWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("value"))
      .withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("value") === col("prev"))
      .agg(count(lit(1)).as("n_adjacent_dups"))
  }

  /** W2: rank-and-filter top-N per group (the window form of shrink). */
  def topNPerGroup(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
  }

  /** W9: top-N per group through the bounded TOP-K AGGREGATE
    * (plans.TopKAgg) — the scale form of `topNPerGroup`: the window form
    * sorts every group's full row set after the shuffle; the aggregate's
    * map-side partial pass reduces each group to ≤ n pairs per input
    * partition BEFORE the exchange, so the shuffle carries
    * O(groups × n × partitions) instead of O(rows). Same output contract
    * as w2 (proven row-for-row equal in TopKAggSpec; same oracle SQL).
    */
  def topNPerGroupAgg(spark: SparkSession, dir: String, n: Int = 3): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(graft.plans.TopKAgg.topK(col("o_totalprice"), col("o_orderkey"), n).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), col("col.id").as("o_orderkey"),
        col("col.score").as("o_totalprice"), (col("pos") + 1).cast("int").as("rn"))

  // ---- Set operations -------------------------------------------------

  /** U1/J7 (orphaned_files:101-121): set difference in BOTH directions with
    * a side tag — missing = library∖disk, orphans = disk∖library. Two anti
    * joins unioned; each is a broadcast-able key-only compare.
    */
  def setCompareBothDirections(spark: SparkSession, dir: String): DataFrame = {
    val custWithOrders = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("key")).distinct()
    val allCust = Tables.customer(spark, dir).select(col("c_custkey").as("key"))
    val missing = allCust.join(custWithOrders, Seq("key"), "left_anti")
      .select(lit("no_orders").as("side"), col("key"))
    val orphans = custWithOrders.join(allCust, Seq("key"), "left_anti")
      .select(lit("no_customer").as("side"), col("key"))
    missing.unionByName(orphans)
  }

  /** U2 (dedup.py:77-99): semi-join membership flag. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_with_orders"))
  }

  /** U3 (playlistlinks.py:361-403): union of multiple selections. */
  def unionSelections(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val a = o.filter(col("o_orderpriority") === "1-URGENT").select(lit("urgent").as("src"), col("o_orderkey"))
    val b = o.filter(col("o_orderstatus") === "F").select(lit("finished").as("src"), col("o_orderkey"))
    a.unionByName(b).groupBy(col("src")).agg(count(lit(1)).as("n"))
  }

  /** Skew fallback: salted join. AQE's skew-join split handles most skew at
    * runtime; manual salting is the escape hatch when the hot key sits in a
    * shuffle join AQE can't split (or the dim side can't broadcast). The
    * fact side gets a random-but-deterministic salt (portable hash of a
    * unique key, SURVEY §7.4 — never rand()); the dim side is exploded
    * across all salt values so every (key, salt) partition joins locally.
    * Result set is identical to the unsalted join (proven in PlanSpec).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(crc32(concat_ws("|", fact.columns.toIndexedSeq.map(col): _*)), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** A20: CUBE aggregation — every grouping-set combination of (lang,
    * source) in ONE pass (Expand + one shuffle, the a17 ROLLUP's superset:
    * rollup emits the prefix hierarchy, cube also emits the per-source
    * marginals a mixture report needs). Same grouping()-flag
    * disambiguation and label coalescing as a17; group cardinality is
    * langs × sources (tiny), so the final aggregate is never the
    * bottleneck at any corpus size.
    */
  def cubeStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        grouping(col("lang")).cast("long").as("g_lang"),
        grouping(col("source")).cast("long").as("g_source"))
      .select(coalesce(col("lang"), lit("<all>")).as("lang"),
        coalesce(col("source"), lit("<all>")).as("source"),
        col("g_lang"), col("g_source"), col("n_docs"), col("total_chars"))

  /** W11: COHORT RETENTION — the product-analytics staple over the event
    * stream: users are cohorted by first-active day, and each (cohort,
    * day-offset) cell counts how many of the cohort came back that day.
    *
    * Scale shape: ONE wide shuffle total — the per-user active-day SET
    * builds with map-side partial merges (`collect_set` dedupes each
    * partition's (user, day) stream before anything ships), so the
    * user-keyed exchange carries day-sets, not events. Cohort day is
    * `array_min` of the set (map-side, no window, no self-join), offsets
    * explode map-side, and everything after is report-sized: the
    * (cohort, offset) aggregation and the cohort-size window move at
    * most days × days rows. Per-user state is bounded by distinct active
    * DAYS (≤ a few thousand for any account age) — a bot emitting
    * millions of events still contributes one set entry per day, so the
    * hot-user exposure the w-family documents does not arise here. Day
    * arithmetic is integer epoch-day (`us div 86_400_000_000`):
    * engine-neutral, no timezone/calendar dependence.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000 * 1000
    // integer `div`, never `/` (long / long promotes to double — the
    // Tables.normalizeTs precision rule applies to epoch arithmetic too)
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .select(col("user_id"), expr(s"us div ${dayUs}L").as("day"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("day")).as("days"))
    val offsets = perUser
      .select(array_min(col("days")).as("cohort_day"), explode(col("days")).as("day"))
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
    offsets
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("n_active")))
          .over(Window.partitionBy(col("cohort_day"))))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 4)
          .as("retention_frac"))
  }

  /** W12: ORDERED FUNNEL — how many users complete step1 → step2 → … in
    * order, each within `windowUs` of their FIRST step (conversion
    * analysis over the event stream). Step i's timestamp is the user's
    * earliest step-i event at-or-after their step-(i-1) time — the
    * standard "first qualifying event" funnel semantics, replayed
    * verbatim by the oracle.
    *
    * Scale shape: one user-keyed aggregation per step, but each step's
    * input is pre-filtered to ONE event type (predicate pushed to the
    * scan) and each join's right side is the per-user step frame (≤1 row
    * per user, hash-joined on user_id). No windows, no ordering — min()
    * is the only fold, so no per-user event ordering is ever
    * materialized. Step count is a query constant, so the plan depth is
    * fixed, not data-dependent.
    */
  def funnelSteps(spark: SparkSession, dir: String,
      steps: Seq[String] = Seq("view", "click", "purchase"),
      windowUs: Long = 7L * 86400 * 1000 * 1000): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val first = e.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("us")).as("t0"))
      .select(col("user_id"), col("t0"), col("t0").as("t_prev"))
    val reached = steps.zipWithIndex.tail.scanLeft(first) {
      case (prev, (step, _)) =>
        e.filter(col("event_type") === step)
          .join(prev, Seq("user_id"))
          .filter(col("us") >= col("t_prev") && col("us") <= col("t0") + windowUs)
          .groupBy(col("user_id"))
          .agg(min(col("t0")).as("t0"), min(col("us")).as("t_prev"))
          .select(col("user_id"), col("t0"), col("t_prev"))
    }
    val counts = reached.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("step_idx"), lit(step).as("step"), col("n_users"))
    }
    val all = counts.reduce(_.unionByName(_))
    // conversion fraction vs the step-1 population; the one-row first-step
    // count rides a broadcast join (report-sized at any scale)
    val base = counts.head.select(col("n_users").as("n_first"))
    all.crossJoin(broadcast(base))
      .select(col("step_idx"), col("step"), col("n_users"),
        round(col("n_users").cast("double") / col("n_first"), 4)
          .as("frac_of_first"))
  }

  /** A2c: SKETCH-STATE TABLE + re-aggregation — the warehouse pattern for
    * incremental distinct counts (Snowflake/BigQuery "sketch column"):
    * per (event_type, epoch-day) HLL sketches persist as a bounded
    * binary column (2^p bytes per cell, [[graft.plans.HllSketchAgg]]);
    * any later rollup window MERGES stored cells
    * ([[graft.plans.HllMergeAgg]] — bytewise register max) instead of
    * rescanning the event stream. The merge is associative, commutative
    * and IDEMPOTENT, so daily cells, shard cells, or replayed cells all
    * converge to the register-identical sketch of the whole stream
    * (HllSpec proves register equality), and appending a new day is one
    * sketch row — the incremental-analytics shape: state grows with
    * (groups × days), never with events.
    *
    * The gate output follows the a2b sketch discipline: the EXACT
    * distinct count plus a deterministic ±5% band flag the oracle
    * asserts TRUE — engine-local register contents never surface.
    */
  /** The persisted per (event_type, epoch-day) user-sketch cells, built
    * once per (session, dir) through the real disk path — the shared
    * state behind [[sketchRollup]] (a2c) and [[rollingDistinctUsers]]
    * (w13).
    */
  private def userSketchTable(spark: SparkSession, dir: String): String = {
    val dayUs = 86400L * 1000 * 1000
    graft.SessionCache.getOrElseUpdate(spark, ("userSketches", dir)) {
      val t = f"user_sketches_${dir.hashCode & 0xffffffffL}%x"
      Dedup.dropTableAndLocation(spark, t)
      Tables.events(spark, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("us"), col("user_id"))
        .select(col("event_type"), expr(s"us div ${dayUs}L").as("day"), col("user_id"))
        .groupBy(col("event_type"), col("day"))
        .agg(graft.plans.HllAgg.hllSketch(col("user_id")).as("sk"))
        .write.saveAsTable(t)
      t
    }
  }

  def sketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val name = userSketchTable(spark, dir)
    val merged = spark.table(name)
      .groupBy(col("event_type"))
      .agg(graft.plans.HllAgg.hllMerge(col("sk")).as("hll_users"))
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(exact, Seq("event_type"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("hll_users") - col("exact_users")) * 20 <= col("exact_users"))
          .as("hll_within_5pct"))
  }

  /** A2D — the sketch-state table under RETRACTION: the REBUILD-ONLY
    * deletion semantics the HLL cells document (registers are additive —
    * a max cannot be un-raised — so unlike i7's subtractive counts, a
    * takedown cannot be merged in). The rebuild is CELL-SCOPED, the
    * bounded operation that documentation promises:
    *
    *   - affected cells = (event_type, day) groups containing a removed
    *     user's event (one distinct projection of the takedown slice);
    *   - a NEW generation of the cell table = untouched cells copied
    *     (anti-join — they serve unchanged, no event re-read) ∪ affected
    *     cells re-aggregated from their RETAINED events only (a cell
    *     emptied by the takedown simply vanishes);
    *   - the a2c rollup then runs over the rebuilt plane.
    *
    * Rebuilt cells equal a from-scratch build over the retained corpus
    * exactly (hllSketch is deterministic per input set), so the gate
    * reuses the a2c discipline — exact distinct over retained events +
    * the ±5% band flag — against the full-recompute oracle. The takedown
    * class is user_id ≡ 5 (mod 13).
    */
  def sketchRollupRetracted(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000 * 1000
    def removedPred = pmod(col("user_id"), lit(13)) === 5
    val base = userSketchTable(spark, dir)
    val rebuilt = graft.SessionCache.getOrElseUpdate(spark,
        ("userSketchesRetracted", dir)) {
      val t = f"user_sketches_rm_${dir.hashCode & 0xffffffffL}%x"
      Dedup.dropTableAndLocation(spark, t)
      val ev = Tables.events(spark, dir)
        .select(col("event_type"), col("user_id"),
          expr(s"unix_micros(ts) div ${dayUs}L").as("day"))
      val affected = ev.filter(removedPred)
        .select(col("event_type"), col("day")).distinct()
      val untouched = spark.table(base)
        .join(affected, Seq("event_type", "day"), "left_anti")
      val rebuiltCells = ev.filter(!removedPred)
        .join(affected, Seq("event_type", "day"), "left_semi")
        .groupBy(col("event_type"), col("day"))
        .agg(graft.plans.HllAgg.hllSketch(col("user_id")).as("sk"))
      untouched.unionByName(rebuiltCells).write.saveAsTable(t)
      t
    }
    val merged = spark.table(rebuilt)
      .groupBy(col("event_type"))
      .agg(graft.plans.HllAgg.hllMerge(col("sk")).as("hll_users"))
    val exact = Tables.events(spark, dir)
      .filter(!removedPred)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(exact, Seq("event_type"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("hll_users") - col("exact_users")) * 20 <= col("exact_users"))
          .as("hll_within_5pct"))
  }

  /** W13: ROLLING WINDOWED DISTINCT (7-day active users per day) served
    * from the SKETCH-STATE table — the composition the warehouse sketch
    * column exists for: exact rolling COUNT(DISTINCT) needs every
    * (window, user) pair re-examined per window (a self-join that grows
    * with window × events), while the sketch plane answers every window
    * by merging ≤ `windowDays` stored cells per day. Each cell
    * contributes to the `windowDays` windows that contain it (one small
    * explode over day offsets — the w5 bin trick applied to windows), so
    * the whole computation moves cells (2^p bytes each), never events.
    *
    * Gate discipline: exact rolling distinct (computed independently)
    * plus the ±5% sketch band flag asserted TRUE — same as a2b/a2c.
    */
  def rollingDistinctUsers(spark: SparkSession, dir: String,
      windowDays: Int = 7): DataFrame = {
    val dayUs = 86400L * 1000 * 1000
    val cells = spark.table(userSketchTable(spark, dir))
    val days = cells.select(col("day")).distinct()
    // cell at day c serves windows ending at c .. c+windowDays-1; keep
    // only windows anchored on a day that exists in the data
    val est = cells
      .select(explode(sequence(col("day"),
        col("day") + (windowDays - 1))).as("day"), col("sk"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(graft.plans.HllAgg.hllMerge(col("sk")).as("est_users"))
    val events = Tables.events(spark, dir)
      .select(unix_micros(col("ts")).as("us"), col("user_id"))
      .select(expr(s"us div ${dayUs}L").as("eday"), col("user_id"))
    val exact = events
      .select(explode(sequence(col("eday"),
        col("eday") + (windowDays - 1))).as("day"), col("user_id"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.join(exact, Seq("day"))
      .select(col("day"), col("exact_users"),
        (abs(col("est_users") - col("exact_users")) * 20 <= col("exact_users"))
          .as("hll_within_5pct"))
  }

  // ---- Ad-hoc SQL pass-through ---------------------------------------

  /** F11/§2.11 (sql_to_playlist:58-71; playlistlinks.py:177-184 --where):
    * arbitrary user SQL against registered views — the reference's raw SQL
    * surface, satisfied wholesale by Spark SQL.
    */
  def adhocSql(spark: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(sql)
  }
}
