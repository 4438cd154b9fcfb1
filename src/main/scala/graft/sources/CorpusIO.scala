package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Corpus interchange formats beyond Parquet/Avro (reference export surface:
  * `export/DwCAExporter.scala`, `util/AvroUtil.scala` — here generalised to
  * the formats an LLM-corpus pipeline actually trades in).
  *
  * - JSONL (newline-delimited JSON): the de-facto LLM training-corpus
  *   interchange format (one document object per line). Spark's native
  *   json source shards reads/writes per file split, so a 100 TB corpus
  *   of .jsonl.gz shards parallelises across executors with no driver
  *   involvement; an explicit schema on read skips the schema-inference
  *   pre-scan, which at corpus scale is a full extra pass.
  * - ORC: the columnar alternative where the consumer side is Hive/Trino;
  *   Spark ships the native vectorized reader, predicate pushdown and
  *   column pruning included.
  */
object CorpusIO {

  /** Write one JSON object per row, newline-delimited. `compression`:
    * "gzip" / "zstd" / "none" — shard-level codecs that stay splittable
    * at the FILE granularity (shard count = partition count, so size
    * shards via the upstream partitioning, not the codec). */
  def writeJsonl(df: DataFrame, path: String,
      compression: String = "none"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .json(path)

  /** Schema-explicit JSONL read: no inference pre-scan. Rows that fail to
    * parse surface in `_corrupt_record` under the default PERMISSIVE mode
    * only if that column is declared — callers wanting strictness pass
    * `mode=FAILFAST` via a post-read assertion instead. */
  def readJsonl(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
