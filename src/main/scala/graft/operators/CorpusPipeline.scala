package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** End-to-end training-corpus curation: the composition a real pretraining
  * data pipeline runs, as one documented operator —
  *
  *   1. quality gate (Gopher-style word-count / word-length / alpha-ratio)
  *   2. exact dedup (normalised-content hash, min-id survivor)
  *   3. benchmark decontamination (word n-gram overlap)
  *   4. deterministic split assignment (content-addressed md5)
  *
  * Each stage is the already-tested standalone operator; this pipeline
  * fixes their order (cheap map-only gates first, so the shuffling stages
  * see fewer rows) and the column contract between them.
  *
  * Scale: stage 1 is map-only; stage 2 is one shuffle on the content hash;
  * stage 3 shuffles hashed grams against a broadcast-able benchmark side;
  * stage 4 is map-only. Nothing collects to the driver.
  */
object CorpusPipeline {

  /** Tuning knobs; defaults follow the published Gopher thresholds scaled
    * to short synthetic docs. */
  case class Config(
      minWords: Long = 20,
      maxWords: Long = 100000,
      minMeanWordLen: Double = 2.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaWordRatio: Double = 0.8,
      decontaminateNgram: Int = 8,
      splitSalt: String = "v1",
      splits: Seq[(String, Double)] = Seq("test" -> 0.05, "val" -> 0.05))

  /** Returns the curated corpus: one row per surviving document with its
    * `split` assignment and `contaminated` flag (contaminated docs are
    * KEPT and flagged — dropping them is a caller policy, not a data
    * decision). */
  def curateCorpus(docs: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, cfg: Config = Config()): DataFrame = {
    val txt = col(textCol)
    // 1. quality gate — map-only. The scores are staged as columns first:
    // meanWordLength is an interpreted HOF (`aggregate`) and is referenced
    // twice in the predicate; an alias referenced >1× is NOT inlined by
    // CollapseProject, so this guarantees one evaluation per row.
    val quality = docs
      .withColumn("_nw", TF.tokenCount(txt))
      .withColumn("_mwl", TF.meanWordLength(txt))
      .withColumn("_awr", TF.alphaWordRatio(txt))
      // nonPushableGate (round 12, guide §4.4): pushdown would inline
      // all three staged stats back into a copy of this condition below
      // the scan-side exchange, re-running the interpreted HOFs on one
      // task; the gate pins the filter here, reading the staged columns
      .filter(graft.Tuning.nonPushableGate(
        col("_nw") >= cfg.minWords && col("_nw") <= cfg.maxWords &&
        col("_mwl") >= cfg.minMeanWordLen &&
        col("_mwl") <= cfg.maxMeanWordLen &&
        col("_awr") >= cfg.minAlphaWordRatio))
      .drop("_nw", "_mwl", "_awr")
    // 2. exact dedup, min id survives
    val deduped = Dedup.dropExactDuplicates(quality, idCol, textCol)
    // 3. decontamination flag
    val flagged = Curation.decontaminate(deduped, benchmark, idCol,
      textCol, cfg.decontaminateNgram)
    // 4. split assignment
    Curation.assignSplit(flagged, idCol, cfg.splitSalt, cfg.splits)
  }
}
