package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model (JASA 1969),
  * the statistical backbone of real-world entity resolution (master data
  * dedup, census linkage). Complements the distance-based ER pipeline
  * (q108: blocking → Jaro-Winkler → connected components) with the
  * likelihood-ratio decision theory: each comparison field carries an
  * agreement weight log2(m/u) and a disagreement weight
  * log2((1−m)/(1−u)), where m = P(agree | same entity) and
  * u = P(agree | different entities); a pair's total weight classifies it
  * as match / possible / nonmatch against two thresholds.
  *
  * Shape at 100 TB: candidate pairs come from an equi-join on the blocking
  * key (never a cross join); the per-field agreement tests and the weight
  * sum are pure column algebra inside the join's whole-stage codegen, so
  * the cost is the blocked pair count — the blocking key bounds the
  * quadratic term exactly as in q108 and J8.
  */
object RecordLinkage {

  /** One comparison field: column name plus the Fellegi–Sunter m / u
    * probabilities (0 < u < m < 1 for a discriminating field). */
  final case class FieldParams(name: String, m: Double, u: Double) {
    require(m > 0 && m < 1 && u > 0 && u < 1, s"m,u in (0,1): $name")
    val agreeWeight: Double = math.log(m / u) / math.log(2.0)
    val disagreeWeight: Double =
      math.log((1.0 - m) / (1.0 - u)) / math.log(2.0)
  }

  /** Self-linkage of `df` within `blockCol` blocks. Agreement on a field
    * is exact equality of the trimmed lowercase string form; a null on
    * either side disagrees (conservative — the standard simple treatment).
    * Returns one row per candidate pair (idA < idB) with the total weight
    * and the decision at (`tUpper`, `tLower`]. */
  def fellegiSunter(df: DataFrame, idCol: String, blockCol: String,
      fields: Seq[FieldParams], tUpper: Double, tLower: Double): DataFrame = {
    require(fields.nonEmpty && tUpper >= tLower, "fields + ordered thresholds")
    def side(tag: String) = df.select(
      col(idCol).as(s"id_$tag") +: col(blockCol).as(s"blk_$tag") +:
        fields.map(f => lower(trim(col(f.name).cast("string")))
          .as(s"${f.name}_$tag")): _*)
    val pairs = side("a").join(side("b"),
      col("blk_a") === col("blk_b") && col("id_a") < col("id_b"))
    val weight = fields.map { f =>
      val a = col(s"${f.name}_a"); val b = col(s"${f.name}_b")
      when(a.isNotNull && b.isNotNull && a === b, lit(f.agreeWeight))
        .otherwise(lit(f.disagreeWeight))
    }.reduce(_ + _)
    pairs.select(col("id_a"), col("id_b"), col("blk_a").as("block"),
        round(weight, 4).as("weight"))
      .withColumn("decision",
        when(col("weight") > tUpper, lit("match"))
          .when(col("weight") > tLower, lit("possible"))
          .otherwise(lit("nonmatch")))
  }
}
