package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Session-scoped memoization (persisted intermediates, view-registration
  * state) with eviction when the session's context stops.
  *
  * The round-2 pattern — bare `TrieMap[SparkSession, _]` fields — retained
  * stopped sessions forever in a long-lived multi-session process. All
  * session-keyed state now routes through here: the first use per session
  * installs a SparkListener whose `onApplicationEnd` drops every entry for
  * that session, so stopped sessions (and the lock objects / cached
  * DataFrames hanging off them) become collectable.
  *
  * `TrieMap.getOrElseUpdate` is atomic in Scala 2.13; a racing duplicate
  * `create` is tolerable for every use here (a losing `persist()` marks a
  * plan the CacheManager already tracks — sameResult dedups it).
  *
  * Eviction granularity is the CONTEXT, not the session: `newSession()`
  * clones sharing one SparkContext are all evicted when that context
  * stops. That is the right lifetime for what lives here — persisted
  * DataFrames' cached blocks die with the context anyway.
  *
  * SHARED-RDD LEDGER (round 19): every RDD persisted while a cache
  * entry's `create` runs is recorded as session-SHARED — these are the
  * blocks other queries will read again (persisted shingle tables,
  * containment selections, tier caches), so [[Scratch.scoped]]'s
  * end-of-gate sweep must never unpersist them (a localCheckpoint's
  * lineage is truncated: unpersisting one that is still referenced is
  * not a slowdown but a "checkpoint block not found" failure). A gate
  * that is ITSELF a cache entry sweeps its scratch INSIDE `create`
  * (before this wrapper diffs), so its dead intermediates are gone from
  * `getPersistentRDDs` by the time the ledger records survivors.
  */
object SessionCache {
  private val store = TrieMap.empty[(SparkSession, Any), Any]
  private val hooked = TrieMap.empty[SparkSession, Unit]
  private val sharedIds = TrieMap.empty[(SparkSession, Int), Unit]

  def getOrElseUpdate[V](spark: SparkSession, key: Any)(create: => V): V = {
    hook(spark)
    store.getOrElseUpdate((spark, key), {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val out = create
      (spark.sparkContext.getPersistentRDDs.keySet -- before)
        .foreach(id => sharedIds.put((spark, id), ()))
      out
    }).asInstanceOf[V]
  }

  /** Is this RDD id one a session cache entry persisted (and so may be
    * re-read by any later query)? Consulted by [[Scratch.scoped]].
    */
  private[graft] def isShared(spark: SparkSession, id: Int): Boolean =
    sharedIds.contains((spark, id))

  /** Drop ledger entries whose RDDs are no longer persistent: an
    * unpersisted id never returns (RDD ids are allocated monotonically
    * per context), so a dead entry can only overshoot — it permanently
    * exempts a future *different* leak from sweeping if the ledger is
    * consulted by id alone. Pruning at every [[Scratch.scoped]] entry
    * bounds the ledger at the LIVE persistent-RDD count for the life
    * of the session (the ADVICE-r19 unbounded-growth fix).
    */
  private[graft] def pruneLedger(spark: SparkSession): Unit = {
    val live = spark.sparkContext.getPersistentRDDs.keySet
    sharedIds.filterInPlace { case ((s, id), _) =>
      (s ne spark) || live.contains(id) }
    ()
  }

  def get[V](spark: SparkSession, key: Any): Option[V] =
    store.get((spark, key)).map(_.asInstanceOf[V])

  def put(spark: SparkSession, key: Any, value: Any): Unit = {
    hook(spark)
    store.put((spark, key), value)
  }

  private def hook(spark: SparkSession): Unit =
    hooked.getOrElseUpdate(spark, {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          store.filterInPlace { case ((s, _), _) => s ne spark }
          sharedIds.filterInPlace { case ((s, _), _) => s ne spark }
          hooked.remove(spark)
          ()
        }
      })
    })
}
