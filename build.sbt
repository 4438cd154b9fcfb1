ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
ThisBuild / scalacOptions += "-deprecation"
name := "biocachestorespark"
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
// Route forked `run` output straight to stdout, un-prefixed: the driver
// parses Bench's one-line JSON from process output, and sbt's default
// logger wraps every line in "[info] " which breaks json parsing
// (BENCH_r01-r04 all show "parsed": null for exactly this reason).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Scale-correctness gate: derive a 10x dataset, run the 12-query
// representative oracle subset at that scale, replay in DuckDB
// (graft.ScaleCheck). Companion of `sbt test` for 10x behaviour.
addCommandAlias("scaleCheck", "Compile/runMain graft.ScaleCheck")

// ── Parallel test groups (round 13, VERDICT r12 item 2) ──
// The suite had grown to ~2300 s of WALL in one forked JVM (one shared
// local[4] session, 91 suites strictly sequential) — past the driver's
// test budget. Suites are split into N test groups, each group its own
// forked JVM with its own SparkSession, groups running CONCURRENTLY:
// per-suite semantics (one session per JVM, suites sequential within a
// group) are unchanged, isolation is strictly stronger than before (7
// suites mutate session conf/temp views — now at most intra-group), and
// the wall divides by ~N on a 32-core host (each JVM is local[4]).
// SPARK_GRAFT_TEST_GROUPS=1 restores the single-JVM layout.
val testGroupCount = sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "8").toInt
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value
  val base = (Test / baseDirectory).value
  val env = (Test / envVars).value
  // deterministic spread: sort by name, round-robin — adjacent heavy
  // round-suites land in different groups
  val sorted = tests.sortBy(_.name)
  (0 until testGroupCount).map { i =>
    val group = sorted.zipWithIndex.collect {
      case (t, j) if j % testGroupCount == i => t
    }
    Tests.Group(
      s"g$i",
      group,
      Tests.SubProcess(ForkOptions(
        javaHome = None,
        outputStrategy = None,
        bootJars = Vector.empty,
        workingDirectory = Some(base),
        runJVMOptions = (opts ++ Seq(
          // per-group warehouse so concurrent JVMs never collide on
          // ./spark-warehouse (saveAsTable/bucketed-table suites)
          s"-Dspark.sql.warehouse.dir=${java.nio.file.Files.createTempDirectory(s"graft_test_wh_$i").toString}"
        )).toVector,
        connectInput = false,
        envVars = env))
    )
  }.filter(_.tests.nonEmpty)
}
// let all test-group JVMs run at once (default caps forked test groups)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(testGroupCount.max(4)))
