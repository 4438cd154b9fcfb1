package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for every suite (JVM-wide). */
object SparkTestSession {
  /** Root of the driver-generated parquet fixtures. Overridable via
    * `GRAFT_TESTDATA` so the suites degrade to skipped (assume-cancel)
    * rather than erroring on a machine without the shipped fixtures. */
  val testdataRoot: String =
    sys.env.getOrElse("GRAFT_TESTDATA", "/root/testdata")

  def sfDir(sf: String): String = s"$testdataRoot/sf$sf"

  def fixturesPresent(sf: String): Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sfDir(sf)))

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
