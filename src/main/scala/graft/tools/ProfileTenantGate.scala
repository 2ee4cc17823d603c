package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop profiler for the batched tenant action gates: times one
  * gate cold in a fresh session (pick via SPARK_GRAFT_GATE =
  * d57|d61|d62b|s23b; default d62b). Not part of any driver contract.
  */
object ProfileTenantGate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gate = sys.env.getOrElse("SPARK_GRAFT_GATE", "d62b")
    val t0 = System.nanoTime()
    val n = gate match {
      case "d57" => graft.operators.Dedup.tenantRebandGate(spark, dir).count()
      case "d61" => graft.operators.Dedup.tenantWinnowRetuneGate(spark, dir).count()
      case "s23b" => graft.operators.Similarity
        .tenantAnnRebucketGate(spark, dir, nTenants = 8).count()
      case _ => graft.operators.Dedup.tenantSimhashRebandGate(spark, dir,
        maxHamming = 6, nTenants = 8).count()
    }
    println(f"${gate}_total ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    spark.stop()
  }
}
