package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def componentsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap

  test("two separate components get their min ids as labels") {
    val got = componentsOf(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("path graph longer than one hop converges") {
    // a 12-node chain needs several propagation rounds
    val chain = (1L to 11L).map(i => (i, i + 1))
    val got = componentsOf(chain)
    assert(got.size == 12 && got.values.forall(_ == 1L))
  }

  test("min label flows against the edge direction too") {
    // the small id sits at the 'dst' end of its only edge
    val got = componentsOf(Seq((5L, 1L), (5L, 6L)))
    assert(got == Map(1L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("duplicate and self-referencing edges are harmless") {
    val got = componentsOf(Seq((2L, 3L), (3L, 2L), (2L, 2L), (2L, 3L)))
    assert(got == Map(2L -> 2L, 3L -> 2L))
  }

  test("cluster summary has one row per component with member count") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Components.clusterSummary(pairs, "id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 3L), (10L, 2L, 11L)))
  }

  test("pointer jumping: a 300-node path converges within O(log n) rounds") {
    // pure min-label propagation needs ~300 rounds here; hooking +
    // doubling must land the min (node 0) everywhere within 12 — the
    // worst orientation (min at one END of the path) included
    val edges = (0L until 299L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Components.connectedComponents(edges, "id_a", "id_b",
        maxIterations = 12)
      .as[(Long, Long)].collect()
    assert(got.length == 300 && got.forall(_._2 == 0L),
      s"labels not converged: ${got.filter(_._2 != 0L).take(5).toSeq}")
  }
}
