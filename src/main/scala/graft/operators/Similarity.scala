package graft.operators

import graft.Tables
import graft.functions.Exprs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (Array[Float] vectors). Two tiers:
  *
  *   - brute-force cosine top-k: the exact baseline. The probe set is tiny
  *     and broadcast; the corpus streams through a map-side cross product —
  *     at 1000 executors this is embarrassingly parallel, no corpus shuffle,
  *     and the window top-k keeps only k rows per probe past the exchange.
  *   - LSH-bucketed: sign-random-projection hyperplanes derived from
  *     portable md5 bits (deterministic, engine-independent), candidates
  *     only within matching buckets → sub-linear probe cost at scale.
  *
  * Cosine math runs in double precision via codegen'd zip_with/aggregate
  * (Exprs.cosine) — no UDF in the hot path.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each probe vector (vec_id < nProbes),
    * excluding self. Probe side is broadcast; ties broken by vec_id.
    */
  def bruteForceTopK(spark: SparkSession, dir: String,
      nProbes: Int = 5, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val probes = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("embedding"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(probes), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("probe_emb"), col("embedding")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos"), col("rn"))
  }

  /** Sign-random-projection bucket id per vector: `nPlanes` deterministic
    * hyperplanes; plane j's i-th coefficient = hexval(md5("plane:j:i")[1]) - 7.5.
    * Bit j = sign(dot(v, plane_j)); bucket = Σ bit_j << j. Map-side only.
    */
  def lshBuckets(spark: SparkSession, dir: String, nPlanes: Int = 8): DataFrame = {
    val emb = transform(col("embedding"), x => x.cast("double"))
    val bucket = (0 until nPlanes).map { j =>
      // dot(v, plane_j): fold over the vector with a position-indexed plane coeff
      val dot = aggregate(
        zip_with(emb, sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => x * (hexVal(substring(md5(concat(lit(s"plane:$j:"), i.cast("string"))), 1, 1)) - lit(7.5))),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), bucket.as("bucket"))
  }

  /** ANN via LSH buckets: probes meet only corpus vectors in the same
    * bucket; exact cosine re-ranks within the candidate set. Recall < 1 by
    * construction (that's the approximation); at 100 TB the bucket join is
    * the scale path — the corpus is hash-partitioned by bucket and the
    * probe side is broadcast.
    */
  def lshTopK(spark: SparkSession, dir: String,
      nProbes: Int = 5, k: Int = 5, nPlanes: Int = 8): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val buckets = lshBuckets(spark, dir, nPlanes).select(col("vec_id"), col("bucket"))
    val withBucket = e.join(buckets, Seq("vec_id"))
    val probes = withBucket.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"), col("bucket"))
    val corpus = withBucket
      .select(col("vec_id").as("neighbor_id"), col("embedding"), col("bucket"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("probe_emb"), col("embedding")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos"), col("rn"))
  }

  /** Centroid per label — the IVF coarse-quantizer training step (mean
    * vector per cluster), one hash aggregation using element-wise array
    * sums. Demonstrates vector aggregation without ever collecting vectors.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val dim = 64
    val sumCols = (0 until dim).map(i =>
      sum(element_at(col("embedding"), i + 1).cast("double")).as(s"s$i"))
    val aggCols = count(lit(1)).as("n") +: sumCols
    val agg = e.groupBy(col("label"))
      .agg(aggCols.head, aggCols.tail: _*)
    agg.select(col("label"), col("n"),
      array((0 until dim).map(i => round(col(s"s$i") / col("n"), 4)): _*).as("centroid"))
  }
}
