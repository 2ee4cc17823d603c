package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScratchHll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val r = Tables.lineitem(spark, d).groupBy(col("l_returnflag"))
        .agg(graft.plans.HllAgg.hllDistinct(col("l_partkey")).as("hll"),
          approx_count_distinct(col("l_partkey")).as("hllpp_05"),
          approx_count_distinct(col("l_partkey"), 0.02).as("hllpp_02"),
          countDistinct(col("l_partkey")).as("exact"))
        .orderBy("l_returnflag").collect()
      r.foreach { row =>
        val (f, h, p5, p2, e) = (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
        println(f"SCRATCH $sf $f hll=$h (${100.0*(h-e)/e}%.2f%%) hllpp05=$p5 (${100.0*(p5-e)/e}%.2f%%) hllpp02=$p2 (${100.0*(p2-e)/e}%.2f%%) exact=$e")
      }
    }
    spark.stop()
  }
}
