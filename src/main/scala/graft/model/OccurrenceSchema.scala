package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested occurrence layout (SURVEY.md §1.5): one row per record with
  * sibling `raw` and `processed` structs over the same leaf names, plus
  * assertions and record-level flags — the columnar replacement for the
  * reference's `field` / `field_p` / `field_qa` suffix routing
  * (`load/FullRecordMapper.scala:244-262` in
  * /root/reference/src/main/scala/au/org/ala/biocache/).
  *
  * The enrichment pipeline works on the flat layout (raw DwC columns +
  * `processed_*`); these utilities convert between the two. Raw⋈processed
  * comparison (reference `Store.getComparison`, `Store.scala:92-125`) is a
  * projection over the nested form — no join.
  */
object OccurrenceSchema {

  val recordLevelColumns: Seq[String] = Seq(
    "rowKey", "dataResourceUid", "assertions", "geospatiallyKosher",
    "taxonomicallyKosher", "originalSensitiveValues", "isSensitive", "cl", "el")

  /** Flat enriched frame → nested (rowKey, raw struct, processed struct,
    * assertions, flags). Every `processed_x` column pairs with raw `x` when
    * present; unpaired raw columns appear only under `raw`. */
  def nest(df: DataFrame): DataFrame = {
    val processedCols = df.columns.filter(_.startsWith("processed_"))
    val rawCols = df.columns
      .filterNot(_.startsWith("processed_"))
      .filterNot(recordLevelColumns.contains)
    val keep = recordLevelColumns.filter(df.columns.contains)
    df.select(
      keep.map(col) ++ Seq(
        struct(rawCols.map(col).toIndexedSeq: _*).as("raw"),
        struct(processedCols.map(c =>
          col(c).as(c.stripPrefix("processed_"))).toIndexedSeq: _*)
          .as("processed")): _*)
  }

  /** Inverse of `nest`. */
  def flatten(df: DataFrame): DataFrame = {
    val keep = recordLevelColumns.filter(df.columns.contains)
    val rawFields = df.select("raw.*").columns
    val processedFields = df.select("processed.*").columns
    df.select(
      keep.map(col) ++
        rawFields.map(f => col(s"raw.$f").as(f)) ++
        processedFields.map(f => col(s"processed.$f").as(s"processed_$f")): _*)
  }

  /** Raw-vs-processed comparison rows (reference `Store.getComparison`):
    * one row per field with both versions, for fields where they differ. */
  def comparison(nested: DataFrame, rowKey: String): DataFrame = {
    val processedFields = nested.select("processed.*").columns
    val rawFields = nested.select("raw.*").columns.toSet
    val pairs = processedFields.filter(rawFields.contains).map { f =>
      struct(lit(f).as("field"),
        col(s"raw.$f").cast("string").as("raw"),
        col(s"processed.$f").cast("string").as("processed"))
    }
    nested.filter(col("rowKey") === rowKey)
      .select(explode(array(pairs.toIndexedSeq: _*)).as("cmp"))
      .select("cmp.field", "cmp.raw", "cmp.processed")
      .filter(!(col("raw") <=> col("processed")))
  }
}
