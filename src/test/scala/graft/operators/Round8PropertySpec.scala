package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-input property checks for the round-8 operator tier, each
  * against an in-memory brute-force reference (same style as
  * OperatorPropertySpec: deterministic ScalaCheck sampling, few cases,
  * each covering a whole random dataset).
  */
class Round8PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = Seed(88L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  test("groupAuc equals the pairwise probability definition on random data") {
    // AUC == P(score_pos > score_neg) + 0.5 * P(tie), the estimator the
    // mid-rank U statistic must reproduce exactly
    val gen = for {
      n <- Gen.choose(20, 60)
      scores <- Gen.listOfN(n, Gen.choose(0, 9)) // coarse -> many ties
      labels <- Gen.listOfN(n, Gen.oneOf(0, 1))
    } yield scores.map(_.toDouble).zip(labels)
    cases(gen, 4) { rows =>
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        val pairs = for (p <- pos; q <- neg)
          yield (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
        val want = pairs.sum / (pos.size.toDouble * neg.size)
        val got = Profiling.groupAuc(
          rows.map { case (s, y) => ("g", s, y) }.toDF("slice", "s", "y"),
          "slice", "s", "y")
          .select("auc").as[Double].collect()(0)
        assert(math.abs(got - BigDecimal(want).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"auc=$got want=$want")
      }
    }
  }

  test("golden-record survivorship equals the per-field latest-non-null scan") {
    val gen = for {
      n <- Gen.choose(30, 80)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 6L)
        ts <- Gen.choose(1L, 50L)
        v <- Gen.option(Gen.choose(0, 100))
      } yield (u, ts, v))
    } yield rows.zipWithIndex.map { case ((u, ts, v), i) =>
      (u, ts, i.toLong, v.map(_.toDouble))
    }
    cases(gen, 4) { rows =>
      val df = rows.toDF("user_id", "ts", "event_id", "value")
      val got = df.groupBy("user_id")
        .agg(max(when(col("value").isNotNull,
          struct(col("ts"), col("event_id"), col("value").as("v"))))
          .getField("v").as("latest"))
        .as[(Long, Option[Double])].collect().toMap
      val want = rows.groupBy(_._1).map { case (u, rs) =>
        u -> rs.filter(_._4.isDefined)
          .sortBy(r => (r._2, r._3)).lastOption.flatMap(_._4)
      }
      assert(got == want)
    }
  }

  test("skyline is invariant to input partitioning and row order") {
    val gen = for {
      n <- Gen.choose(50, 200)
      pts <- Gen.listOfN(n,
        Gen.zip(Gen.choose(0, 25), Gen.choose(0, 25)))
    } yield pts.map(p => (p._1.toDouble, p._2.toDouble))
    cases(gen, 3) { pts =>
      val base = Skyline.skyline2D(pts.toDF("x", "y"), "x", "y")
        .select("x", "y", "n_rows")
        .as[(Double, Double, Long)].collect().toSet
      val shuffled = Skyline
        .skyline2D(scala.util.Random.javaRandomToRandom(
          new java.util.Random(7)).shuffle(pts).toDF("x", "y")
          .repartition(7), "x", "y")
        .select("x", "y", "n_rows")
        .as[(Double, Double, Long)].collect().toSet
      assert(base == shuffled)
    }
  }

  test("theilSenSlope is invariant under outlier injection up to 25% of pairs") {
    // robustness property: corrupting <= ~13% of POINTS (so < 25% of
    // pairwise slopes) moves the median slope less than OLS would
    val clean = (0 until 30).map(i => ("g", i.toDouble, 1.5 * i + 2, i.toLong))
    val corrupted = clean.take(26) ++
      (26 until 30).map(i => ("g", i.toDouble, 9999.0, i.toLong))
    val slope = EventAnalytics.theilSenSlope(
      corrupted.toDF("g", "x", "y", "id"), "g", "x", "y", "id")
      .select("sen_slope").as[Double].collect()(0)
    assert(math.abs(slope - 1.5) < 0.2, s"sen=$slope")
  }

  test("dictionary encode round-trip: decode(encode(x)) == x for seen terms") {
    val gen = Gen.listOfN(60, Gen.oneOf("a", "bb", "ccc", "dd", "e"))
    cases(gen, 3) { terms =>
      val df = terms.toDF("t")
      val dict = FeatureEncoding.fitDictionary(df, "t")
      val enc = FeatureEncoding.encodeWithDictionary(df, "t", dict)
      val back = enc.join(
        dict.select(col("idx"), col("term").as("t2")), Seq("idx"))
      assert(back.filter(col("t") =!= col("t2")).count() == 0)
      // indexes are dense 0..|vocab|-1
      val idxs = dict.select("idx").as[Long].collect().sorted
      assert(idxs.toSeq == (0L until idxs.length).toSeq)
    }
  }
}
