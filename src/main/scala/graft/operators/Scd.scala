package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: a change log of
  * (key, attributes, change_ts) becomes one row per version with a
  * validity interval — the lakehouse-standard way to keep every historical
  * value queryable ("what was this supplier's address when the order
  * shipped" joins on `valid_from <= ts < valid_to`).
  *
  * One window per key (single shuffle on the key): `valid_to` is the next
  * version's `valid_from` (null = current), `version_seq` numbers versions
  * from 1. Consecutive rows with UNCHANGED attributes are collapsed first
  * — a redelivered identical snapshot must not open a new version.
  */
object Scd {

  def buildScd2(changeLog: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "at least one tracked attribute")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol))
    // collapse runs of identical attribute values (keep the earliest row
    // of each run): a row opens a version only if any attribute differs
    // from the previous row's
    val attrStruct = struct(attrCols.map(col): _*)
    val changed = changeLog
      .withColumn("_prev", lag(attrStruct, 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= attrStruct)
      .drop("_prev")
    val w2 = Window.partitionBy(keyCol).orderBy(col(tsCol))
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("version_seq", row_number().over(w2).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol)
  }

  /** Point-in-time join: each fact row picks the dimension version valid
    * at its own timestamp (`valid_from <= ts < valid_to`, open-ended
    * current version included; facts before the first version keep nulls —
    * left join).
    *
    * Plan shape: the key equality makes this a plain shuffle (or
    * broadcast) hash/merge join with the interval predicate as a residual
    * filter — NOT a nested-loop range join — because SCD2 intervals per
    * key are disjoint: at most one dimension row survives the residual,
    * so the join never fans out. Scale-safe wherever the fact join itself
    * is. */
  def pointInTimeJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val f = facts.alias("f")
    val d = dim.alias("d")
    f.join(d,
        col(s"f.$keyCol") === col(s"d.$keyCol") &&
          col("d.valid_from") <= col(s"f.$tsCol") &&
          (col("d.valid_to").isNull || col(s"f.$tsCol") < col("d.valid_to")),
        "left")
      .drop(col(s"d.$keyCol"))
  }
}
