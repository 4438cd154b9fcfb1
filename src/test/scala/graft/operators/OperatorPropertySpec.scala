package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the scale-join/session operators against brute-force
  * reference implementations on randomized inputs (raw ScalaCheck sampled
  * deterministically; Spark round-trips are expensive, so fewer cases than
  * the scalar-function battery — each case covers a whole random dataset).
  */
class OperatorPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = Seed(1234L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val bigGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 60)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 999L)))
  } yield rows.zipWithIndex.map { case ((k, v), i) => (k, v * 1000 + i) }

  private val smallGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(0, 8)
    keys <- Gen.listOfN(n, Gen.choose(0L, 7L))
  } yield keys.distinct.map(k => (k, s"dim$k"))

  test("saltedEquiJoin equals the plain join on random skewed data") {
    cases(Gen.zip(bigGen, smallGen, Gen.choose(1, 7)), 15) {
      case (big, small, saltFactor) =>
        val bigDf = big.toDF("k", "payload")
        val smallDf = small.toDF("k", "dim")
        val got = ScaleJoins.saltedEquiJoin(bigDf, smallDf, "k", saltFactor)
          .select("k", "payload", "dim")
          .as[(Long, Long, String)].collect().sorted.toSeq
        val smallMap = small.toMap
        val want = big.flatMap { case (k, p) =>
          smallMap.get(k).map(d => (k, p, d))
        }.sorted
        assert(got == want, s"saltFactor=$saltFactor big=$big small=$small")
    }
  }

  // right side: unique (key, time) per the determinism contract
  private val asofGen: Gen[(List[(Long, Long, Long)], List[(Long, Long, Double)])] =
    for {
      nl <- Gen.choose(0, 40)
      left <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
      nr <- Gen.choose(0, 30)
      right <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L)))
    } yield (
      left.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) },
      right.distinct.map { case (k, t) => (k, t, (k * 100 + t).toDouble) })

  test("asofJoinBackward equals the brute-force latest-at-or-before lookup") {
    cases(asofGen, 15) { case (left, right) =>
      val got = ScaleJoins.asofJoinBackward(
          left.toDF("k", "t", "uid"), right.toDF("k", "t", "v"),
          "k", "t", "v")
        .select("uid", "asof_value")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      left.foreach { case (k, t, uid) =>
        val want = right.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
        assert(got(uid) == want, s"k=$k t=$t left=$left right=$right")
      }
    }
  }

  private val sessGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 50)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 2000L)))
  } yield rows.distinct // unique (key, ts) keeps the reference unambiguous

  test("sessionize equals the brute-force gap scan") {
    cases(Gen.zip(sessGen, Gen.choose(1L, 300L)), 15) { case (events, gap) =>
      val df = events.map { case (k, t) =>
        (k, new java.sql.Timestamp(t * 1000L), 1.0)
      }.toDF("k", "ts", "v")
      val got = Sessions.sessionize(df, "k", "ts", "v", gap)
        .select("k", "session_seq", "n_events")
        .as[(Long, Long, Long)].collect().toSet
      val want = events.groupBy(_._1).flatMap { case (k, rows) =>
        val ts = rows.map(_._2).sorted
        val seqs = ts.foldLeft(List.empty[(Long, List[Long])]) {
          case (Nil, t) => List((1L, List(t)))
          case (acc @ ((seq, cur) :: rest), t) =>
            if (t - cur.head <= gap) (seq, t :: cur) :: rest
            else (seq + 1, List(t)) :: acc
        }
        seqs.map { case (seq, members) => (k, seq, members.size.toLong) }
      }.toSet
      assert(got == want, s"gap=$gap events=$events")
    }
  }
}
