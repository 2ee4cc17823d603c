package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic eviction for one-shot audit/lifecycle scratch frames —
  * the round-19 answer to the round-18 bench drift (gc 8–10 s/pass,
  * d10/d15 >2×, tables 251→259): every recall audit, census, and
  * reband/retune gate localCheckpoints corpus-sized intermediates
  * (posting tables, sliced selections, measure rows) that are DEAD the
  * moment the gate's few result rows exist, yet their MEMORY_AND_DISK
  * blocks lingered until the JVM happened to GC the RDD objects — under
  * a 247-query × 4-pass bench that is an unbounded, unmeasured heap tax
  * (the ContextCleaner is weak-reference-driven, so the cleanup bill
  * lands as GC pressure at arbitrary later queries — exactly the
  * non-flat gc signature BENCH_r18 showed).
  *
  * [[scoped]] makes the lifetime explicit: run the gate body, collect
  * its (small — every caller returns audit rows, never corpus frames)
  * result into a driver-local relation, then synchronously unpersist
  * every RDD the body newly persisted EXCEPT session-shared cache
  * blocks ([[SessionCache.isShared]] — unpersisting a truncated-lineage
  * localCheckpoint that a later query still references is not a
  * slowdown but a failure, so the shared ledger is consulted, and
  * first-touch shared caches created inside the body stay protected).
  * The returned LocalRelation frame references no swept block — it can
  * be re-planned, cached in SessionCache, or re-counted on every bench
  * pass for free.
  */
object Scratch {
  /** Maximum rows a scoped gate result may carry — a tripwire, not a
    * tuning knob: every scoped call site (the ~25 recall audits,
    * censuses, reband/retune lifecycles, and the routed-top-k gates)
    * hands back monitor rows — 1 to ~50 today (phases × tenants, or
    * tenants × probes × k), T=8 censuses at 8–16. 10k gives two-plus
    * orders of magnitude of growth headroom (more tenants, more
    * probes) while a corpus-sized frame (5k docs already at sf0.1,
    * growing with SF) fails LOUD at the smallest real scale before
    * materializing on the driver. (Round-20 right-sizing: the old
    * 100k ceiling sat ABOVE small-SF corpus sizes, so a leaked
    * corpus frame would have slipped through exactly where the tests
    * run.)
    */
  private val MaxScopedRows = 10000

  /** The one active scope per SparkContext (owner thread). Scopes may
    * NEST on one thread (an outer gate's cache-entry body running its
    * own inner scope — the sweep diffs compose: the inner scope's
    * `before` set contains every outer checkpoint, so it never sweeps
    * them), but two scopes on DIFFERENT threads would each diff the
    * GLOBAL getPersistentRDDs set and sweep the other's live
    * truncated-lineage checkpoints — a "checkpoint block not found"
    * failure, not a slowdown. All call sites are sequential today;
    * this guard makes a future parallel caller fail loudly at scope
    * entry instead of corrupting another scope's blocks (ADVICE r19).
    */
  private val activeScope =
    scala.collection.concurrent.TrieMap.empty[
      org.apache.spark.SparkContext, Thread]

  def scoped(spark: SparkSession)(body: => DataFrame): DataFrame = {
    val sc = spark.sparkContext
    val me = Thread.currentThread()
    val owner = activeScope.putIfAbsent(sc, me)
    val nested = owner.exists(_ eq me)
    require(owner.isEmpty || nested,
      "Scratch.scoped: a scope is already active on this SparkContext " +
        s"from thread '${owner.get.getName}' — concurrent scopes would " +
        "sweep each other's live localCheckpoint blocks")
    try scopedBody(spark, sc, body)
    finally if (!nested) { activeScope.remove(sc); () }
  }

  private def scopedBody(spark: SparkSession,
      sc: org.apache.spark.SparkContext,
      body: => DataFrame): DataFrame = {
    // entry-time ledger prune: shared-cache ids whose RDDs have been
    // unpersisted are dead forever (RDD ids are monotonic), so dropping
    // them bounds the ledger over a long session (ADVICE r19 #3)
    SessionCache.pruneLedger(spark)
    val before = sc.getPersistentRDDs.keySet
    val out = body
    val rows = out.collect()
    require(rows.length <= MaxScopedRows,
      s"Scratch.scoped result has ${rows.length} rows — this wrapper is " +
        "for small audit/gate results only")
    val localized = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), out.schema)
    // THREE guards select the sweep set: (1) new in this scope; (2) not
    // on the session-shared ledger; (3) locally CHECKPOINTED — a lazily
    // `persist()`ed shared cache (e.g. the shingle table in a run with
    // no warmup phase) can materialize its RDD for the first time
    // inside someone else's scope, where the ledger recorded nothing;
    // sweeping it would silently set its storage level to NONE for the
    // rest of the session. Scratch frames are always eager
    // localCheckpoints, so the isLocallyCheckpointed test keeps every
    // CacheManager-backed persist out of the sweep by construction.
    sc.getPersistentRDDs
      .filter { case (id, rdd) =>
        !before.contains(id) &&
          org.apache.spark.rdd.graftbridge.RddBridge.isLocallyCheckpointed(rdd) &&
          !SessionCache.isShared(spark, id) }
      .values.foreach(_.unpersist(blocking = false))
    localized
  }
}
