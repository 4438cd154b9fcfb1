package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Star-schema + document/embedding table access (see TESTDATA.md).
  *
  * Mirrors the reference's scan surface (`persistence/PersistenceManager.scala:92-151`
  * pageOverAll/pageOverSelect): in Spark a scan is just `spark.read.parquet`
  * with Catalyst handling projection/predicate pushdown, so this object is the
  * whole "storage layer".
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan one table (reference S6: full scan; S7 projected scan is `.select`).
    *
    * `events.ts` is physically TIMESTAMP(NANOS), which Spark's vectorized
    * Parquet reader rejects; read it as long nanos and convert to a µs
    * timestamp (floor division — matches DuckDB's ns→µs cast).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  /** Register every table as a temp view so `spark.sql` works against the dir. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
