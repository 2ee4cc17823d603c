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
  */
object SessionCache {
  private val store = TrieMap.empty[(SparkSession, Any), Any]
  private val hooked = TrieMap.empty[SparkSession, Unit]

  def getOrElseUpdate[V](spark: SparkSession, key: Any)(create: => V): V = {
    hook(spark)
    store.getOrElseUpdate((spark, key), create).asInstanceOf[V]
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
          hooked.remove(spark)
          ()
        }
      })
    })
}
