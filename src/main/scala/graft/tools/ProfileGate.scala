package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop step profiler for the lifecycle gates: times one gate cold
  * with per-job wall attribution via job descriptions + a listener that
  * prints every job's duration. Pick via SPARK_GRAFT_GATE. Not part of
  * any driver contract.
  */
object ProfileGate {
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
    val totJob = new java.util.concurrent.atomic.AtomicLong(0)
    val nJobs = new java.util.concurrent.atomic.AtomicLong(0)
    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(js.jobId, (System.nanoTime(),
          js.stageInfos.lastOption.map(_.name).getOrElse("")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach { case (t0, site) =>
          val sec = (System.nanoTime() - t0) / 1e9
          totJob.addAndGet((sec * 1000).toLong)
          nJobs.incrementAndGet()
          if (sec > 0.15) println(f"  job ${je.jobId}%4d ${sec}%7.2f s  $site")
        }
    })
    // prefix of a full-inventory session: warm what Bench warms, so the
    // gate's cold time matches its in-bench attribution
    if (sys.env.contains("SPARK_GRAFT_WARM")) {
      graft.Tables.all.foreach { t =>
        try graft.Tables.read(spark, dir, t).count()
        catch { case _: Throwable => () }
      }
      try graft.Tables.registerViews(spark, dir) catch { case _: Throwable => () }
      try graft.operators.Dedup.warmInputProjections(spark, dir)
      catch { case _: Throwable => () }
      try graft.operators.Dedup.warmServingIndexes(spark, dir)
      catch { case _: Throwable => () }
      try graft.operators.Similarity.warmServingIndexes(spark, dir)
      catch { case _: Throwable => () }
    }
    val gates = sys.env.getOrElse("SPARK_GRAFT_GATE", "d43_minhash_reband_trigger")
      .split(",").toSeq
    // SPARK_GRAFT_PASSES=n re-runs every gate n times (default 1): pass 1
    // is the cold/lifecycle run, later passes profile the STEADY shape —
    // the per-job lines attribute where a steady median actually goes.
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "1").toInt
    (1 to passes).foreach { p =>
      gates.foreach { gate =>
        val j0 = nJobs.get(); val s0 = totJob.get()
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(gate)(spark, dir).count()
        println(f"${gate}_total[pass$p] ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n " +
          f"jobs=${nJobs.get() - j0} job_sec=${(totJob.get() - s0) / 1000.0}%.2f")
      }
    }
    Thread.sleep(500)
    spark.stop()
  }
}
