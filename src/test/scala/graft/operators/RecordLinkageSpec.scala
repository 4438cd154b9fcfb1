package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RecordLinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import RecordLinkage.FieldParams

  private val f1 = FieldParams("city", 0.9, 0.1)  // agree +log2(9), disagree +log2(1/9)
  private val f2 = FieldParams("zip", 0.8, 0.2)   // agree +2, disagree +log2(0.25)

  private val df = Seq(
    (1L, 10, "Springfield", "12345"),
    (2L, 10, "springfield ", "12345"),  // agrees on both after normalise
    (3L, 10, "Shelbyville", "12345"),   // agrees on zip only
    (4L, 20, "Springfield", "12345")    // other block — never paired with 1-3
  ).toDF("id", "blk", "city", "zip")

  private def run(tU: Double, tL: Double) =
    RecordLinkage.fellegiSunter(df, "id", "blk", Seq(f1, f2), tU, tL)
      .select("id_a", "id_b", "weight", "decision")
      .as[(Long, Long, Double, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("weights are the summed log2 likelihood ratios") {
    val got = run(3.0, 0.0)
    val both = math.log(9.0) / math.log(2.0) + 2.0
    val zipOnly = math.log((1 - 0.9) / (1 - 0.1)) / math.log(2.0) + 2.0
    assert(math.abs(got((1L, 2L))._1 - both) < 1e-3)
    assert(math.abs(got((1L, 3L))._1 - zipOnly) < 1e-3)
  }

  test("blocking: cross-block pairs never form; ids ordered a < b") {
    val got = run(3.0, 0.0)
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("decisions split at the thresholds") {
    val got = run(3.0, 0.0)
    assert(got((1L, 2L))._2 == "match")      // ≈ 5.17 > 3
    assert(got((2L, 3L))._2 == "nonmatch")   // ≈ −1.17 ≤ 0
  }

  test("null on either side disagrees") {
    val withNull = Seq(
      (1L, 10, null.asInstanceOf[String], "12345"),
      (2L, 10, "springfield", "12345")
    ).toDF("id", "blk", "city", "zip")
    val w = RecordLinkage.fellegiSunter(withNull, "id", "blk",
        Seq(f1, f2), 10.0, -10.0)
      .select("weight").as[Double].head()
    val expect = math.log((1 - 0.9) / (1 - 0.1)) / math.log(2.0) + 2.0
    assert(math.abs(w - expect) < 1e-3)
  }

  // a mid-size corpus with nulls, duplicate values, and uneven blocks —
  // the count-algebra estimator must reproduce the pair scan EXACTLY
  private def muCorpus = {
    def city(i: Long) =
      if (i % 13 == 0) null else s"city${i % 7}"
    def zip(i: Long) =
      if (i % 17 == 0) null else s"zip${i % 5}"
    def street(i: Long) = s"st${i % 3}"
    (1L to 400L).map(i =>
      (i, (i % 6).toInt, city(i), zip(i), street(i)))
      .toDF("id", "blk", "city", "zip", "street")
  }

  test("count-algebra pattern counts ≡ pair-scan pattern counts, " +
    "nulls and duplicate values included") {
    val f3 = FieldParams("street", 0.7, 0.3)
    val fields = Seq(f1, f2, f3)
    // ground truth from the materialized pairs: bucket by rounded weight
    // (weights are in bijection with patterns for these params)
    val pairs = RecordLinkage.fellegiSunter(muCorpus, "id", "blk",
        fields, 100.0, -100.0)
      .groupBy("weight").count()
      .as[(Double, Long)].collect().toMap
    val est = RecordLinkage.fellegiSunterPatternCounts(muCorpus, "blk",
        fields)
      .select("weight", "n_pairs").as[(Double, Long)].collect()
      .groupBy(_._1).map { case (w, rs) => w -> rs.map(_._2).sum }
    assert(est.filter(_._2 > 0) == pairs,
      s"estimator ${est.filter(_._2 > 0)} vs pair scan $pairs")
    // completeness: Σ n_pairs over patterns = Σ_blocks C(n,2)
    val n = muCorpus.groupBy("blk").count().as[(Int, Long)].collect()
      .map { case (_, c) => c * (c - 1) / 2 }.sum
    assert(est.values.sum == n)
  }

  test("decision stats: estimator path ≡ pair-scan path row-for-row") {
    val fields = Seq(f1, f2, FieldParams("street", 0.7, 0.3))
    def stats(maxNaive: Long) =
      RecordLinkage.fellegiSunterDecisionStats(muCorpus, "id", "blk",
          fields, tUpper = 3.0, tLower = 0.0, maxNaiveBlock = maxNaive)
        .as[(String, Long, Double, Double)].collect().toSeq
    val viaPairs = stats(maxNaive = 100000L) // largest block ≪ ⇒ scan
    val viaCounts = stats(maxNaive = 1L)     // force the estimator
    assert(viaPairs.nonEmpty && viaPairs == viaCounts)
  }

  test("EM m/u estimation recovers a planted mixture from the " +
    "count-algebra sufficient statistics") {
    // 80 entities x 3 copies in 4 blocks, THREE comparison fields —
    // the classic FS identifiability floor (2^k patterns must exceed
    // the 2k+1 free parameters, so k >= 3; with k = 2 the mixture has
    // a continuum of ML solutions and EM legitimately lands elsewhere).
    // Same-entity pairs (the planted matches) agree on all three;
    // different-entity pairs never agree on name and collide on
    // city/zip at ~1/7 and ~1/5 (moduli coprime with the 4-block
    // split, so every block sees all values).
    val rows = for {
      e <- 0 until 80
      c <- 0 until 3
    } yield (e.toLong * 10 + c, e % 4, s"name$e", s"city${e % 7}",
      s"zip${e % 5}")
    val df = rows.toDF("id", "blk", "nm", "city", "zip")
    val fit = RecordLinkage.fellegiSunterEM(df, "blk",
      Seq("nm", "city", "zip"), maxIter = 500)
    assert(fit.converged, s"EM did not converge: $fit")
    val m = fit.fields.map(f => f.name -> f.m).toMap
    val u = fit.fields.map(f => f.name -> f.u).toMap
    assert(m("nm") > 0.9 && u("nm") < 0.05, s"name m/u off: $fit")
    assert(m("city") > 0.9, s"city m off: $fit")
    assert(u("city") > 0.05 && u("city") < 0.3, s"city u off: $fit")
    assert(m("zip") > 0.9, s"zip m off: $fit")
    assert(u("zip") > 0.1 && u("zip") < 0.35, s"zip u off: $fit")
    // prevalence ~ planted match share: 80 entities x C(3,2) = 240
    // match pairs of 4 x C(60,2) = 7080 total
    val expectP = 240.0 / (4 * 60L * 59 / 2)
    assert(math.abs(fit.p - expectP) < 0.05, s"p=${fit.p} vs $expectP")
    assert(fit.logLikelihood < 0 && !fit.logLikelihood.isNaN)
  }

  test("EM tolerates a degenerate always-agree field via clamping " +
    "(no NaN, no infinite weights)") {
    val rows = (1L to 60L).map(i => (i, (i % 3).toInt, "constant",
      s"v${i % 7}"))
    val df = rows.toDF("id", "blk", "k", "v")
    val fit = RecordLinkage.fellegiSunterEM(df, "blk", Seq("k", "v"))
    assert(fit.fields.forall(f =>
      !f.agreeWeight.isNaN && !f.agreeWeight.isInfinite &&
        !f.disagreeWeight.isNaN && !f.disagreeWeight.isInfinite))
    assert(!fit.logLikelihood.isNaN)
  }

  test("empty input: decision stats and pair joins return empty, not NPE") {
    val empty = muCorpus.filter($"id" < 0)
    assert(RecordLinkage.fellegiSunterDecisionStats(empty, "id", "blk",
      Seq(f1, f2), 3.0, 0.0).count() == 0)
    assert(RecordLinkage.jaroWinklerPairs(empty, "id", "city", 0.96,
      Seq("blk")).count() == 0)
    assert(RecordLinkage.blockedEditDistancePairs(empty, "id", "city", 2,
      Seq("blk")).count() == 0)
  }
}
