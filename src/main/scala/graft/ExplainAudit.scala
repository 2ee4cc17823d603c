package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print `explain("formatted")` for the named gate
  * queries (or the known-expensive set by default) at sf0.001.
  * Run: `sbt "runMain graft.ExplainAudit [query ...]"`.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucket sort order is only reported behind this flag (safe: Spark
      // self-checks one-file-per-bucket, which saveNearDupIndex guarantees)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "t7_repetition", "d3_minhash_lsh_pairs", "d4_ngram_jaccard_pairs",
      "d6_embedding_neardup", "s3_label_centroids", "s4_ann_ivf",
      "w4_asof_join", "w5_range_join", "t10_vocabulary", "a17_rollup",
      "w7_sessionize", "w8_ntile_quartiles", "t11_rebalance_sample",
      "d10_contamination", "a16b_approx_percentiles", "t12_pii_scrub",
      "t13_distinctive_terms", "e1_corpus_layout",
      "d11_simhash_pairs", "d12_boilerplate", "t14_sequence_pack",
      "t15_heavy_hitters", "t16_quality_sample", "s5_hard_negatives",
      "w10_burst_detection",
      "d13_delta_neardup", "d14_span_scrub", "d15_delta_simhash",
      "s6_ann_kmeans", "t17_mixture_sample", "m1_binary_meta",
      "m2_media_stats",
      "d10b_contamination_bloom", "d20_containment", "d21_semdedup",
      "s7b_ann_quantized_indexed", "s11b_ann_pq_indexed", "s12b_ann_filtered_indexed",
      "g1_pagerank", "g1b_delta_pagerank", "w11_retention", "w12_funnel",
      "w13_rolling_distinct", "a2c_sketch_rollup", "a16c_percentile_sketch_rollup",
      "j8b_hamming_join", "j8c_edit_distance_join", "t20_source_cap",
      "i6_incremental_agg",
      "d22_index_remove", "s13_ann_remove", "d23_canonical_remove",
      "d21c_semdedup_banded", "w6b_running_sum_chunked", "w10b_burst_chunked",
      "w4b_asof_chunked", "a6b_tenant_stats", "i7_retract_agg",
      "a2d_cell_rebuild", "m4b_image_neardup_png")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
