package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the round-7 operator tier against brute-force
  * reference implementations on randomized inputs (same deterministic
  * ScalaCheck sampling as [[OperatorPropertySpec]] — each case is a whole
  * random dataset, so counts stay small). */
class Round7PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = Seed(20260814L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  test("water filling: feasible, source-capped, and maximal") {
    val g = for {
      n <- Gen.choose(1, 12)
      counts <- Gen.listOfN(n, Gen.choose(0L, 200L))
      budget <- Gen.choose(0L, 1500L)
    } yield (counts.zipWithIndex.map { case (c, i) => (s"s$i", c) }, budget)
    cases(g, 12) { case (counts, budget) =>
      val out = Curation.waterFillAllocation(counts.toDF("source", "n"), budget)
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getAs[Long]("alloc"), r.getAs[java.lang.Long]("cap")))
      val total = counts.map(_._2).sum
      val allocSum = out.map(_._3).sum
      assert(out.forall { case (_, n, a, _) => a >= 0 && a <= n })
      if (total <= budget) {
        assert(out.forall { case (_, n, a, c) => a == n && c == null })
      } else {
        val cap = out.head._4.longValue
        assert(out.forall(_._4.longValue == cap))
        assert(allocSum == counts.map(c => math.min(c._2, cap)).sum)
        assert(allocSum <= budget)
        // maximality: raising the cap by one would overshoot the budget
        assert(counts.map(c => math.min(c._2, cap + 1)).sum > budget)
      }
    }
  }

  test("cdc chunking: lossless reassembly on random unicode text") {
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("héllo", "日本語テキスト", "数据", "🙂ok", "naïve"))
    val g = for {
      n <- Gen.choose(0, 120)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" ")
    cases(g, 12) { text =>
      val chunks = Dedup.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
          "doc_id", "text")
        .collect().sortBy(_.getLong(1)).map(_.getString(2))
      assert(chunks.mkString == text)
      if (text.nonEmpty) assert(chunks.forall(_.nonEmpty))
    }
  }

  test("weighted median matches the brute-force definition") {
    val g = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 50L), Gen.choose(1L, 30L)))
    } yield rows.zipWithIndex.map { case ((v, w), i) => (v, w, i.toLong) }
    cases(g, 12) { rows =>
      val df = rows.map { case (v, w, i) => ("g", v, w, i) }
        .toDF("grp", "v", "w", "id")
      val got = Profiling.weightedMedian(df, "grp", "v", "w", "id")
        .collect().head.getAs[Long]("weighted_median")
      val total = rows.map(_._2).sum
      val want = rows.sortBy(r => (r._1, r._3))
        .scanLeft((0L, 0L)) { case ((_, cum), (v, w, _)) => (v, cum + w) }
        .drop(1).find(_._2 * 2 >= total).get._1
      assert(got == want, s"rows=$rows")
    }
  }

  test("ewma closed form equals the sequential recurrence") {
    val g = for {
      n <- Gen.choose(1, 25)
      xs <- Gen.listOfN(n, Gen.choose(1, 50))
    } yield xs
    cases(g, 12) { xs =>
      // one event per day per count → daily counts are exactly xs
      val ev = xs.zipWithIndex.flatMap { case (x, d) =>
        (1 to x).map(k => ("s", f"2024-01-${d + 1}%02d 0${k % 9}:00:00"))
      }
      // cap at 28 days to stay within January
      if (xs.length <= 28) {
        val df = ev.toDF("series", "ts")
          .withColumn("ts", col("ts").cast("timestamp"))
        val got = EventAnalytics.ewmaDailyCounts(df, "series", "ts", 0.3)
          .collect().head.getAs[Double]("ewma")
        val want = xs.map(_.toDouble).reduceLeft((s, x) => 0.3 * x + 0.7 * s)
        assert(math.abs(got - want) < 1e-6, s"xs=$xs got=$got want=$want")
      }
    }
  }

  test("k-core at convergence: every survivor keeps degree >= k") {
    val g = for {
      n <- Gen.choose(0, 40)
      edges <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)))
      k <- Gen.choose(1, 4)
    } yield (edges.filter(e => e._1 != e._2), k)
    cases(g, 10) { case (edges, k) =>
      if (edges.nonEmpty) {
        val sym = Graphs.symmetrize(edges.toDF("src", "dst"))
        val out = Graphs.kCorePeel(sym, k, rounds = 16)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        assert(out.forall(_._3), s"not converged in 16 rounds: $edges")
        assert(out.forall(_._2 >= k),
          s"survivor below k=$k: ${out.toSeq} edges=$edges")
      }
    }
  }
}
