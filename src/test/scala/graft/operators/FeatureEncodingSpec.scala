package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 feature encoders + link prediction: dictionary encode,
  * leave-one-out target encoding, Adamic–Adar — each against hand-traced
  * answers including the contractual edge cases (ties, OOV, singleton
  * categories, hub caps, known-edge exclusion).
  */
class FeatureEncodingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fitDictionary: frequency order, lexicographic ties, nulls excluded") {
    val df = Seq("b", "b", "a", "a", "c", null)
      .toDF("term0").select(col("term0").as("t"))
    val got = FeatureEncoding.fitDictionary(df, "t")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    // a and b tie at 2 -> a first; c last; null dropped
    assert(got.toSeq == Seq(("a", 0L, 2L), ("b", 1L, 2L), ("c", 2L, 1L)))
  }

  test("encodeWithDictionary: unseen terms take the default index") {
    val dict = FeatureEncoding.fitDictionary(
      Seq("x", "x", "y").toDF("t"), "t")
    val got = FeatureEncoding.encodeWithDictionary(
        Seq("x", "y", "zzz").toDF("t"), "t", dict, defaultIdx = 2L)
      .select("t", "idx").as[(String, Long)].collect().toSet
    assert(got == Set(("x", 0L), ("y", 1L), ("zzz", 2L)))
  }

  test("targetEncodeLoo: hand-computed smoothing; singleton with m=0 is null") {
    // cat A: targets 10, 20, 30 (sum 60); cat B: single 100
    // prior = 160/4 = 40; m = 2
    // A row y=10: ((60-10) + 2*40) / (3-1+2) = 130/4 = 32.5
    val df = Seq(("A", 10.0, 1), ("A", 20.0, 2), ("A", 30.0, 3),
      ("B", 100.0, 4)).toDF("cat", "y", "id")
    val got = FeatureEncoding.targetEncodeLoo(df, "cat", "y", m = 2.0)
      .select("id", "enc").as[(Int, Double)].collect().toMap
    assert(got(1) == 32.5 && got(2) == 30.0 && got(3) == 27.5)
    // B's single row: ((100-100) + 2*40) / (1-1+2) = 40 (the prior)
    assert(got(4) == 40.0)
    // m = 0: the singleton's denominator is 0 -> null, never fabricated
    val loo0 = FeatureEncoding.targetEncodeLoo(df, "cat", "y", m = 0.0)
      .filter(col("id") === 4).select("enc").collect()(0)
    assert(loo0.isNullAt(0))
  }

  test("adamicAdar: path graph hand trace, known edges excluded") {
    // path 1-2-3-4: candidate pairs are the 2-hop ones only: (1,3) via 2,
    // (2,4) via 3; both shared neighbours have degree 2 -> score 1/ln 2
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graphs.adamicAdar(e)
      .as[(Long, Long, Long, Double)].collect().toSet
    val s = BigDecimal(1.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Set((1L, 3L, 1L, s), (2L, 4L, 1L, s)))
  }

  test("adamicAdar: hub above maxDeg contributes no wedges") {
    // star: hub 0 connected to 1..5 (deg 5). With maxDeg=4 the hub is
    // dropped as a shared neighbour -> no predictions at all; with the
    // default cap all C(5,2) leaf pairs appear with score 1/ln 5.
    val e = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    assert(Graphs.adamicAdar(e, maxDeg = 4).count() == 0)
    val full = Graphs.adamicAdar(e).as[(Long, Long, Long, Double)].collect()
    assert(full.length == 10 &&
      full.forall(r => r._3 == 1L &&
        math.abs(r._4 - 1.0 / math.log(5.0)) < 1e-6))
  }
}
