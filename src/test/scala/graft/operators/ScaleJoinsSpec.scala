package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleJoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedEquiJoin is row-identical to the plain equi-join") {
    // one hot key (90% of rows) plus a tail
    val big = ((1 to 900).map(i => (7L, s"row$i")) ++
      (1 to 100).map(i => (i.toLong % 5, s"tail$i")))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (1L, "one"), (2L, "two"), (99L, "unmatched"))
      .toDF("k", "dim")
    val plain = big.join(small, "k")
    val salted = ScaleJoins.saltedEquiJoin(big, small, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedEquiJoin with saltFactor 1 degenerates to the plain join") {
    val big = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "d")
    val got = ScaleJoins.saltedEquiJoin(big, small, "k", 1)
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "a", "x")))
  }

  test("asofJoinBackward attaches the most recent at-or-before right value") {
    val left = Seq(
      (1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e3"),
      (2L, 10L, "e4")).toDF("k", "t", "name")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 11L, 200.0))
      .toDF("k", "t", "v")
    val got = ScaleJoins.asofJoinBackward(left, right, "k", "t", "v")
      .select("name", "asof_value")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map(
      "e1" -> Some(100.0), // exact tie: inclusive
      "e2" -> Some(150.0), // most recent prior, not first
      "e3" -> None,        // nothing at or before t=5
      "e4" -> None))       // right row for k=2 is later (t=11 > 10)
  }

  test("asofJoinBackward keeps every left row and column") {
    val left = Seq((1L, 1L, "a", true)).toDF("k", "t", "s", "flag")
    val right = Seq((1L, 1L, 9.0)).toDF("k", "t", "v")
    val out = ScaleJoins.asofJoinBackward(left, right, "k", "t", "v")
    assert(out.columns.toSeq == Seq("k", "t", "s", "flag", "asof_value"))
    assert(out.count() == 1)
  }

  test("sortedNeighborhoodPairs equals the brute-force rank-window join") {
    val rows = Seq(
      ("b1", "smith", 1L), ("b1", "smyth", 2L), ("b1", "smithe", 3L),
      ("b1", "adams", 4L), ("b1", "adam", 5L),
      ("b2", "jones", 6L), ("b2", "johns", 7L))
    val df = rows.toDF("blk", "name", "id")
    val got = ScaleJoins.sortedNeighborhoodPairs(df, "blk", "name", "id", 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force: rank within block by (name, id), pair ranks within 2
    val expected = rows.groupBy(_._1).values.flatMap { blk =>
      val ranked = blk.sortBy(r => (r._2, r._3)).map(_._3).zipWithIndex
      for {
        (a, ra) <- ranked
        (b, rb) <- ranked
        if rb > ra && rb - ra <= 2
      } yield (a, b)
    }.toSet
    assert(got == expected && expected.nonEmpty)
    // every pair's rank distance is within the window
    val dists = ScaleJoins
      .sortedNeighborhoodPairs(df, "blk", "name", "id", 2)
      .select("rank_dist").as[Long].collect()
    assert(dists.forall(d => d >= 1 && d <= 2))
  }

  test("distanceSelfJoin matches a brute-force haversine join") {
    // 4×4 grid, ~111 m lat spacing, ~91 m lon spacing at -35°
    val pts = (0 until 16).map { i =>
      (i.toLong, -35.0 + (i % 4) * 0.001, 149.0 + (i / 4) * 0.001)
    }.toDF("pid", "lat", "lon")
    val got = ScaleJoins.distanceSelfJoin(pts, "pid", "lat", "lon", 250.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def hav(a: (Double, Double), b: (Double, Double)): Double = {
      val dLat = math.toRadians(b._1 - a._1)
      val dLon = math.toRadians(b._2 - a._2)
      2 * 6371000.0 * math.asin(math.sqrt(
        math.pow(math.sin(dLat / 2), 2) +
          math.cos(math.toRadians(a._1)) * math.cos(math.toRadians(b._1)) *
            math.pow(math.sin(dLon / 2), 2)))
    }
    val coords = (0 until 16).map(i =>
      i.toLong -> (-35.0 + (i % 4) * 0.001, 149.0 + (i / 4) * 0.001)).toMap
    val expected = (for {
      a <- 0L until 16L; b <- (a + 1) until 16L
      if hav(coords(a), coords(b)) <= 250.0
    } yield (a, b)).toSet
    assert(got == expected && expected.nonEmpty)
    // sanity: immediate lat neighbours (~111 m) are in, 3-step (~333 m) out
    assert(got.contains((0L, 1L)) && !got.contains((0L, 3L)))
  }

  test("distanceSelfJoin emits each qualifying pair exactly once") {
    val pts = Seq((1L, -35.0, 149.0), (2L, -35.0001, 149.0001))
      .toDF("pid", "lat", "lon")
    val rows = ScaleJoins.distanceSelfJoin(pts, "pid", "lat", "lon", 100.0)
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1L && rows.head.getLong(1) == 2L)
  }
}
