package org.apache.spark.rdd.graftbridge

import org.apache.spark.rdd.RDD

/** Access shim for `RDD.isLocallyCheckpointed`, which Spark 4 keeps
  * package-private to `org.apache.spark.rdd` (the graftbridge/Bridge
  * situation for the RDD API — hence this object's package):
  * [[graft.Scratch]]'s sweep must distinguish eager localCheckpoint
  * scratch blocks (lineage truncated — sweepable once their gate result
  * is collected) from CacheManager-backed persists (recomputable, and
  * possibly shared session caches materializing lazily inside someone
  * else's scope — never sweepable). Storage levels cannot tell the two
  * apart (both default MEMORY_AND_DISK), so the checkpoint flag is the
  * one reliable discriminator.
  */
object RddBridge {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
