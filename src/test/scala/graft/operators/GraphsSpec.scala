package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GraphsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Brute-force synchronous PageRank on the driver, same semantics. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val inflow = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => r(e._1) / out(e._1)).sum
      }
      r = nodes.map(v => v ->
        ((1 - d) / n + d * (inflow.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  test("pageRank matches the brute-force reference on a small digraph") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    val got = Graphs.pageRank(edges.toDF("src", "dst"), iters = 8)
      .as[(Long, Double)].collect().toMap
    val want = refPageRank(edges, 8, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-12, s"$k") }
  }

  test("pageRank conserves total mass with dangling nodes") {
    // node 5 has no out-edges: its mass must redistribute, not vanish
    val edges = Seq((1L, 2L), (2L, 5L), (3L, 5L), (1L, 3L))
    val got = Graphs.pageRank(edges.toDF("src", "dst"), iters = 6)
      .as[(Long, Double)].collect()
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-9)
  }

  test("symmetric star graph ranks the hub highest, leaves equal") {
    val star = Graphs.symmetrize(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("src", "dst"))
    val r = Graphs.pageRank(star, iters = 10).as[(Long, Double)]
      .collect().toMap
    assert(r(1L) > r(2L))
    assert(Seq(3L, 4L, 5L).forall(v => math.abs(r(v) - r(2L)) < 1e-12))
  }

  test("triangleCounts finds each triangle once, per node") {
    // K4 on {1,2,3,4}: every node is in C(3,2)=3 triangles
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val got = Graphs.triangleCounts(k4.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: triangle with a pendant edge") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val got = Graphs.triangleCounts(g.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts ignores duplicate and reversed input edges") {
    val g = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (1L, 3L))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val got = Graphs.triangleCounts(g.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("bipartite graph has zero triangles") {
    val g = for { a <- 1L to 3L; b <- 10L to 12L } yield (a, b)
    assert(Graphs.triangleCounts(g.toDF("a", "b")).count() == 0)
  }

  test("bfsHops: path graph hops, truncated at maxHops") {
    // 1→2→3→4→5, seed 1, maxHops 3: node 5 unreached
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val got = Graphs.bfsHops(e, Seq(1L).toDF("n"), maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfsHops: multiple seeds take the minimum hop; cycles terminate") {
    // cycle 1→2→3→1 plus 3→4; seeds {1, 4}
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
    val got = Graphs.bfsHops(e, Seq(1L, 4L).toDF("n"), maxHops = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("label propagation: hand-traced rounds on two bridged triangles") {
    // triangles {1,2,3} and {7,8,9}, bridge 3–7; deterministic sync LPA
    // with smallest-label ties, traced by hand round by round
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L), (3L, 7L)).toDF("s", "d")
    def run(r: Int): Map[Long, Long] =
      Graphs.labelPropagation(e, r).as[(Long, Long)].collect().toMap
    assert(run(1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      7L -> 3L, 8L -> 7L, 9L -> 7L))
    assert(run(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 3L, 9L -> 3L))
    // by round 3 the two triangles settle into distinct communities
    assert(run(3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 3L, 8L -> 3L, 9L -> 3L))
  }

  test("label propagation: disconnected cliques each settle on their min id") {
    val clique1 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val clique2 = for { a <- 11L to 14L; b <- (a + 1) to 14L } yield (a, b)
    val got = Graphs.labelPropagation(
      (clique1 ++ clique2).toDF("s", "d"), rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert((1L to 4L).forall(got(_) == 1L))
    assert((11L to 14L).forall(got(_) == 11L))
  }
}
