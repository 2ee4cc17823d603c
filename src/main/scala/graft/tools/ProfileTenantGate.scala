package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop profiler for the batched tenant action gates: times the
  * gate cold, then prints the per-phase wall clock the engine logs
  * when SPARK_GRAFT_PROFILE=1. Not part of any driver contract.
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
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.tenantSimhashRebandGate(spark, dir,
      maxHamming = 6, nTenants = 8).count()
    println(f"d62b_total ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    spark.stop()
  }
}
