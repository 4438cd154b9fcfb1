package graft

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import scala.util.{Failure, Success, Try}

/** Crash-freedom battery: every batch entry in [[SparkEntry.queries]] must
  * behave SANELY on zero-row inputs — either return a (possibly empty)
  * result, or reject with a DELIBERATE `require`/argument error carrying a
  * readable message. What must never happen is the accidental failure mode
  * the round-9 advice flagged on `jaroWinklerPairs` (`max(...)` → NULL →
  * `NullPointerException` from `getLong`): an NPE or a bare
  * `NoSuchElementException("next on empty iterator")` means some scalar
  * action assumed at least one data row.
  *
  * At 100 TB this is not a toy case: per-partition slices, date-bounded
  * increments, and filter-heavy curation stages routinely produce empty
  * frames mid-pipeline, and an operator that NPEs on one empty delta kills
  * a whole nightly run.
  *
  * Streaming entries (`readStream` against the dir, AvailableNow) are
  * included: an empty source is the "no new delta tonight" case, and the
  * stream must drain and stop cleanly.
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Empty copies of every table, same schema as the shipped sf0.001.
    * Schemas come from the fixture root (env-overridable via
    * `GRAFT_TESTDATA`); suites assume-cancel when it is absent so the
    * battery degrades to skipped off-box instead of erroring. */
  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-empty-tables").toString
    Tables.names.foreach { n =>
      val schema: StructType =
        Tables.load(spark, SparkTestSession.sfDir("0.001"), n).schema
      spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  /** Streaming entries run their micro-batch engine to completion inside
    * the query function (AvailableNow against the dir), so they join the
    * battery like any batch entry — an empty source directory is exactly
    * the "no new delta tonight" production case and the stream must drain
    * and stop, not hang or throw. Identified by name so a failure reads
    * as streaming at a glance. */
  private val streaming: Set[String] = SparkEntry.queries.keySet
    .filter(n => n.contains("stream") || n.contains("tws_"))

  /** Entries that DELIBERATELY reject empty input with a readable
    * argument-check error (model fitting with zero observations, splits
    * that need both sides, fixtures sized from the data). For these the
    * battery asserts the rejection is an explicit argument error, not an
    * accidental NPE. */
  private def deliberateRejection(e: Throwable): Boolean = {
    // unwrap Spark's layered execution exceptions to the root cause
    var c: Throwable = e
    while (c.getCause != null && (c.getCause ne c)) c = c.getCause
    val ok = c.isInstanceOf[IllegalArgumentException] ||
      c.isInstanceOf[IllegalStateException] ||
      c.isInstanceOf[UnsupportedOperationException]
    ok && c.getMessage != null && c.getMessage.nonEmpty
  }

  private def accidental(e: Throwable): Boolean = {
    var c: Throwable = e
    var found = false
    while (c != null && !found) {
      found = c.isInstanceOf[NullPointerException] ||
        (c.isInstanceOf[NoSuchElementException] &&
          Option(c.getMessage).exists(_.contains("empty")))
      c = if (c.getCause ne c) c.getCause else null
    }
    found
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    val label = if (streaming(name)) "empty input (streaming)" else "empty input"
    test(s"$label: $name") {
      assume(SparkTestSession.fixturesPresent("0.001"),
        s"fixture dir ${SparkTestSession.sfDir("0.001")} absent — skipping")
      Try(SparkEntry.queries(name)(spark, emptyDir).collect()) match {
        case Success(_) => // empty (or constant) result — fine
        case Failure(e) if accidental(e) =>
          fail(s"accidental empty-input failure (${e.getClass.getName}): " +
            s"${e.getMessage}", e)
        case Failure(e) if deliberateRejection(e) => // explicit reject — fine
        case Failure(e) =>
          fail(s"unclassified empty-input failure " +
            s"(${e.getClass.getName}): ${e.getMessage}", e)
      }
    }
  }
}
