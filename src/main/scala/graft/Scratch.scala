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
    * tuning knob: gates hand back audit/census/trigger rows (1–100);
    * if a corpus-sized frame ever lands here the collect would be the
    * bug, so fail loud instead of materializing it on the driver.
    */
  private val MaxScopedRows = 100000

  def scoped(spark: SparkSession)(body: => DataFrame): DataFrame = {
    val sc = spark.sparkContext
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
