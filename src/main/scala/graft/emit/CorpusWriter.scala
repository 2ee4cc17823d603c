package graft.emit

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sharded training-corpus writer — the write-side layout step of a
  * curation pipeline: documents land partitioned on disk by
  * `split=train|val|test / lang=xx` with a deterministic shard number, so
  * a 100 TB corpus becomes a directory tree a trainer reads
  * shard-parallel and a rerun reproduces byte-stable membership.
  *
  * Layout mechanics at scale:
  *   - split is t9's md5 bucket (`TextAnalysis.splitBucket` — the ONE
  *     shared definition) and shard is an independent seeded md5 bucket
  *     mod `nShards`: both are content-free id hashes, so membership never
  *     moves between reruns or engines;
  *   - `repartition(split, lang, shard)` makes each output task own whole
  *     shards (no thousand tiny files per dir), `sortWithinPartitions`
  *     gives readers doc_id-clustered row groups;
  *   - `partitionBy(split, lang)` puts the selection predicates a trainer
  *     actually uses (split, language mix) into the PATH, so downstream
  *     reads partition-prune instead of scanning.
  */
object CorpusWriter {

  /** The layout columns added to each document row. */
  def shardedLayout(docs: DataFrame, nShards: Int,
      trainUpTo: Int = 250, valUpTo: Int = 253): DataFrame = {
    val b = TextAnalysis.splitBucket(col("doc_id"))
    val shardHash = graft.functions.Exprs.hexVal(
      substring(graft.functions.Exprs.seededHash("shard", col("doc_id").cast("string")), 1, 1)) * 16 +
      graft.functions.Exprs.hexVal(
        substring(graft.functions.Exprs.seededHash("shard", col("doc_id").cast("string")), 2, 1))
    docs
      .withColumn("split",
        when(b < trainUpTo, "train").when(b < valUpTo, "val").otherwise("test"))
      .withColumn("shard", pmod(shardHash, lit(nShards)).cast("int"))
  }

  /** Write the corpus under `path` as split=…/lang=…/part-… parquet. */
  def write(docs: DataFrame, path: String, nShards: Int = 4,
      maxRecordsPerFile: Long = 0L): Unit =
    shardedLayout(docs, nShards)
      .repartition(col("split"), col("lang"), col("shard"))
      .sortWithinPartitions(col("doc_id"))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("split", "lang")
      .parquet(path)
}
