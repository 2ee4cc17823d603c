package graft.operators

import graft.Tables
import graft.functions.Exprs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Vector norms are computed once per row below the join boundary, so the
  * per-pair hot path is a single codegen'd dot-product fold — no UDF.
  */
object Similarity {

  private def withVecNorm(df: DataFrame, extra: String*): DataFrame =
    df.select(col("vec_id") +: extra.map(col) :+ doubleVector(col("embedding")).as("v"): _*)
      .withColumn("n", l2Norm(col("v")))

  /** Prepared-vector table (vec_id, label, v, n), materialized once per
    * (session, dir) — every embedding operator (ANN tiers, near-dup tiers)
    * starts from this same float→double + norm projection, so it is the
    * natural shared intermediate (the vector-store "loaded index" step).
    * Evicted with the session via [[graft.SessionCache]].
    */
  private[operators] def preparedEmbeddings(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrElseUpdate(spark, ("embeddingsVN", dir)) {
      withVecNorm(Tables.embeddings(spark, dir), "label").persist()
    }

  /** Bucket id as an expression over an existing double-vector column —
    * lets callers derive buckets in the same projection as v/n instead of
    * re-scanning the table and joining (one scan, no join).
    */
  private[operators] def bucketExpr(v: Column, nPlanes: Int, dim: Int = 64): Column =
    bandBucketExpr(v, 0, nPlanes, dim)

  /** Per-band bucket: bit j = sign(v · plane_{planeOffset+j}). Used by the
    * banded (OR-amplified) near-dup tier, where each band hashes a disjoint
    * slice of the hyperplane family.
    */
  private[operators] def bandBucketExpr(v: Column, planeOffset: Int,
      planesPerBand: Int, dim: Int = 64): Column = {
    val planes = planeCoeffs(planeOffset + planesPerBand, dim)
    (0 until planesPerBand).map { j =>
      val plane = array(planes(planeOffset + j).toIndexedSeq.map(lit): _*)
      when(dotProduct(v, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Exact top-k cosine neighbors for each probe vector (vec_id < nProbes),
    * excluding self. Probe side is broadcast; ties broken by vec_id.
    */
  def bruteForceTopK(spark: SparkSession, dir: String,
      nProbes: Int = 5, k: Int = 10): DataFrame = {
    val e = preparedEmbeddings(spark, dir)
    val probes = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("n").as("pn"))
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("v"), col("n"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(probes), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dotProduct(col("pv"), col("v")) / (col("pn") * col("n")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos"), col("rn"))
  }

  /** HARD-NEGATIVE MINING — contrastive-training data prep: for each
    * probe, the top-k most-similar vectors with a DIFFERENT label (the
    * negatives that most confuse a classifier are the valuable ones).
    * Identical scale shape to [[bruteForceTopK]]'s exact tier — broadcast
    * probes, map-side corpus scan, per-probe window top-k — with the
    * label-mismatch predicate riding the same broadcast join; the
    * LSH/IVF tiers bound the scan the same way they do for s2/s4 when the
    * corpus outgrows the exact pass.
    */
  def hardNegatives(spark: SparkSession, dir: String,
      nProbes: Int = 5, k: Int = 5): DataFrame = {
    val e = preparedEmbeddings(spark, dir)
    val probes = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("label").as("probe_label"),
        col("v").as("pv"), col("n").as("pn"))
    val corpus = e.select(col("vec_id").as("neighbor_id"),
      col("label").as("neg_label"), col("v"), col("n"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(probes), col("probe_label") =!= col("neg_label"))
      .withColumn("cos", round(dotProduct(col("pv"), col("v")) / (col("pn") * col("n")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("probe_label"), col("neighbor_id"),
        col("neg_label"), col("cos"), col("rn"))
  }

  /** Deterministic hyperplane coefficient for (plane j, dimension i):
    * hexval(md5("plane:j:i")[0]) - 7.5, precomputed DRIVER-SIDE into literal
    * arrays — values are identical to the in-query md5 formulation (the
    * oracle can still derive them in SQL) but cost zero per row.
    */
  private[operators] def planeCoeffs(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dim) { (j, i) =>
      val hex = md.digest(s"plane:$j:$i".getBytes("UTF-8"))
        .take(1).map(b => f"${b & 0xff}%02x").mkString
      val c = hex.charAt(0)
      val v = if (c >= 'a') c - 'a' + 10 else c - '0'
      v - 7.5
    }
  }

  /** Sign-random-projection bucket id per vector: bit j = sign(v · plane_j);
    * bucket = Σ bit_j << j. Pure map-side arithmetic over literal plane
    * arrays — no hashing in the per-row path.
    */
  def lshBuckets(spark: SparkSession, dir: String, nPlanes: Int = 8, dim: Int = 64): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        bucketExpr(doubleVector(col("embedding")), nPlanes, dim).as("bucket"))

  /** ANN via LSH buckets: probes meet only corpus vectors in the same
    * bucket; exact cosine re-ranks within the candidate set. Recall < 1 by
    * construction (that's the approximation); at 100 TB the bucket join is
    * the scale path — the corpus is hash-partitioned by bucket and the
    * probe side is broadcast.
    */
  def lshTopK(spark: SparkSession, dir: String,
      nProbes: Int = 5, k: Int = 5, nPlanes: Int = 8): DataFrame = {
    // bucket derived map-side over the prepared-vector cache: one scan
    // (shared across all embedding operators), no self-join
    val withBucket = preparedEmbeddings(spark, dir)
      .withColumn("bucket", bucketExpr(col("v"), nPlanes))
    val probes = withBucket.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("n").as("pn"), col("bucket"))
    val corpus = withBucket
      .select(col("vec_id").as("neighbor_id"), col("v"), col("n"), col("bucket"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(probes), Seq("bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dotProduct(col("pv"), col("v")) / (col("pn") * col("n")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos"), col("rn"))
  }

  /** IVF-style ANN: label is the coarse cluster (the trained quantizer's
    * assignment); each probe ranks the cluster CENTROIDS first, then
    * searches only its `nprobe` nearest clusters exactly. At scale the
    * corpus is partitioned by cluster id, probes broadcast, and only
    * nprobe/nclusters of the data is touched per probe — the classic IVF
    * recall/cost dial.
    */
  def ivfTopK(spark: SparkSession, dir: String,
      nProbes: Int = 5, k: Int = 5, nprobe: Int = 2): DataFrame = {
    val cents = labelCentroids(spark, dir)
      .select(col("label"), doubleVector(col("centroid")).as("cv"))
      .withColumn("cn", l2Norm(col("cv")))
    val e = preparedEmbeddings(spark, dir)
    val probesN = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("n").as("pn"))
    // rank clusters per probe by centroid cosine; keep nprobe best
    val wc = Window.partitionBy(col("probe_id"))
      .orderBy(col("ccos").desc, col("label"))
    val probeClusters = probesN.crossJoin(broadcast(cents))
      .withColumn("ccos", dotProduct(col("pv"), col("cv")) / (col("pn") * col("cn")))
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= nprobe)
      .select(col("probe_id"), col("pv"), col("pn"), col("label"))
    // exact search inside the selected clusters only
    val corpus = e.select(col("vec_id").as("neighbor_id"), col("v"), col("n"), col("label"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(probeClusters), Seq("label"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dotProduct(col("pv"), col("v")) / (col("pn") * col("n")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("cos"), col("rn"))
  }

  /** Centroid per label — the IVF coarse-quantizer training step (mean
    * vector per cluster), one hash aggregation using element-wise array
    * sums. Demonstrates vector aggregation without ever collecting vectors.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    // the trained coarse quantizer is reused by both the centroid report
    // (s3) and IVF search (s4) — materialize the (tiny: one row per
    // cluster) result once per (session, dir)
    graft.SessionCache.getOrElseUpdate(spark, ("labelCentroids", dir)) {
      computeLabelCentroids(spark, dir).persist()
    }

  private def computeLabelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val dim = 64
    val sumCols = (0 until dim).map(i =>
      sum(element_at(col("embedding"), i + 1).cast("double")).as(s"s$i"))
    val aggCols = count(lit(1)).as("n") +: sumCols
    val agg = e.groupBy(col("label"))
      .agg(aggCols.head, aggCols.tail: _*)
    agg.select(col("label"), col("n"),
      // + 0.0 normalizes IEEE -0.0 → 0.0: near-zero sums are last-ulp
      // order-dependent across engines, and rounding can land on ±0 whose
      // sign would otherwise leak into the canonical output
      array((0 until dim).map(i => round(col(s"s$i") / col("n"), 4) + 0.0): _*).as("centroid"))
  }

  /** Canonical scalar-row form of `labelCentroids` for the correctness
    * gate: posexplode the centroid to (label, n, dim_idx, value) so the
    * output carries no array column — the driver's compare (and any ANSI
    * oracle) canonicalizes scalar rows; array columns it cannot sort.
    * Same single hash aggregation; the explode is a bounded ×dim fan-out
    * of an already-tiny (one row per cluster) result.
    */
  def labelCentroidsFlat(spark: SparkSession, dir: String): DataFrame =
    labelCentroids(spark, dir)
      .select(col("label"), col("n"),
        posexplode(col("centroid")).as(Seq("dim_idx", "value")))
}
