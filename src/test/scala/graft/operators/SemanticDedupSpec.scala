package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vec(xs: Float*): Seq[Float] = xs

  test("near-identical vectors collapse to one representative per group") {
    // two duplicate groups + one singleton; numCells=1 so no cell split
    val emb = Seq(
      (1L, vec(1f, 0f, 0f)), (2L, vec(0.999f, 0.01f, 0f)),
      (3L, vec(0f, 1f, 0f)), (4L, vec(0.01f, 0.999f, 0f)), (5L, vec(0f, 0.998f, 0.02f)),
      (6L, vec(0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(emb, "vec_id", "embedding",
        numCells = 1, threshold = 0.98)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.map(r => r._1 -> r._2).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 3L, 6L -> 6L))
    assert(got.filter(_._3).map(_._1).toSeq == Seq(1L, 3L, 6L))
  }

  test("every input row comes back exactly once with a keep flag") {
    val emb = (1L to 20L).map(i =>
      (i, vec(i.toFloat, (i * 7 % 5).toFloat, (i * 3 % 11).toFloat)))
      .toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(emb, "vec_id", "embedding",
      numCells = 3, threshold = 0.9999)
    assert(got.count() == 20)
    assert(got.select("id").distinct().count() == 20)
    // representatives are themselves kept
    val reps = got.filter("keep").select("id").as[Long].collect().toSet
    val claimed = got.select("representative").as[Long].collect().toSet
    assert(claimed.subsetOf(reps))
  }
}
