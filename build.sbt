ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "itdbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses the LAST line of `sbt "runMain graft.Bench"` output as
// JSON. sbt's default LoggedOutput strategy prefixes every forked-process
// line with [info]/[error] and appends its own "[success] Total time" -
// both of which broke the round-1/2 bench parse. StdoutOutput passes the
// child's stdout/stderr through verbatim; showSuccess drops the trailer.
Compile / run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default (machine has 125 GiB): headroom for the 218-query
  // inventory's session-cached localCheckpoint blocks at larger SFs.
  // Measured GC at 8g/local[32]/sf0.1 was already benign (1.5-2.2 s per
  // full bench pass) — see PERF.md "d31 root cause" — so this is
  // prophylaxis, not a fix.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// `sbt test` wall time: ~900 s of suite time runs SEQUENTIALLY in one
// forked JVM (suites share one SparkSession; in-JVM parallelism would race
// on SessionCache table builds and trip Scratch.scoped's cross-thread
// guard). Instead, suites are partitioned into four balanced groups, each
// forked into its OWN JVM with its OWN warehouse/derby dirs — full
// isolation (separate SparkContexts, separate catalogs, PID-keyed fixture
// paths), zero fixture or coverage changes, wall time = slowest group
// (~260 s) instead of the 900 s sum. Grouping is by measured suite cost
// (see OPTIMIZATION_r21.md); unknown/new suites land in group 3.
val slowTestGroup: String => Int = {
  case s if s.endsWith("StreamingSpec") => 0
  case s if s.endsWith("TakedownSpec") || s.endsWith("DedupSimilaritySpec") ||
    s.endsWith("ItdbOpsSpec") || s.endsWith("EventsEncodingSpec") => 1
  case s if s.endsWith("IndexRemoveSpec") || s.endsWith("TenantEstateSyncSpec") ||
    s.endsWith("BucketingSpec") || s.endsWith("CurationOpsSpec") => 2
  case _ => 3
}
Test / testGrouping := {
  val base = (Test / javaOptions).value.toVector
  val tgt = target.value
  (Test / definedTests).value.groupBy(t => slowTestGroup(t.name)).toSeq
    .sortBy(_._1).map { case (g, ts) =>
      Tests.Group(s"group$g", ts, Tests.SubProcess(ForkOptions()
        .withRunJVMOptions(base ++ Vector(
          // per-group catalog + warehouse isolation; -Xmx LAST wins in
          // HotSpot, so 12g here overrides the 24g single-JVM default
          // (measured suite heap stays well under it; 4 x 12g fits the box)
          s"-Dspark.sql.warehouse.dir=${(tgt / s"test-wh-g$g").getAbsolutePath}",
          s"-Dderby.system.home=${(tgt / s"test-derby-g$g").getAbsolutePath}",
          "-Xmx12g"))))
    }
}
// the four groups genuinely run concurrently: sbt's DEFAULT restrictions
// include Tags.limit(ForkedTestGroup, 1) and restrictions compose as a
// minimum, so the default set must be REPLACED (appending a higher limit
// changes nothing). limitAll keeps ordinary task parallelism bounded.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(java.lang.Runtime.getRuntime.availableProcessors()),
  Tags.limit(Tags.ForkedTestGroup, 4),
  Tags.exclusiveGroup(Tags.Clean))
