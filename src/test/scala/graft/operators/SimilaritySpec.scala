package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ quantisation: codebook shape, encoding determinism, and ADC recall
  * against the exact brute-force ranking on clustered synthetic vectors. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 32
  private lazy val corpus = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private lazy val queries = corpus.filter(col("vec_id") < 4)
    .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
  private lazy val rest = corpus.filter(col("vec_id") >= 4)

  test("codebooks have the requested shape and encoding is deterministic") {
    val books = Similarity.trainPqCodebooks(rest, "embedding", m = 4, k = 8,
      iterations = 2)
    assert(books.length == 4 && books.forall(_.length == 8) &&
      books.forall(_.forall(_.length == dim / 4)))
    val enc1 = Similarity.pqEncode(rest, "embedding", books)
      .select("vec_id", "pq_codes").as[(Long, Seq[Int])].collect().toMap
    val enc2 = Similarity.pqEncode(rest, "embedding", books)
      .select("vec_id", "pq_codes").as[(Long, Seq[Int])].collect().toMap
    assert(enc1 == enc2)
    assert(enc1.values.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
  }

  test("reranked PQ top-10 recalls most of the exact top-10") {
    val exact = Similarity.bruteForceTopK(rest, queries, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.pqTopK(rest, queries, 10, m = 4, codesPerSub = 16)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(approx.keySet == exact.keySet)
    val recalls = exact.map { case (q, ids) =>
      approx(q).intersect(ids).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean recall@10 $mean; per-query $recalls")
  }

  test("reranked scores ARE exact cosines; raw ADC approximates them") {
    val exact = Similarity.bruteForceTopK(rest, queries, 10)
      .select(col("query_id"), col("vec_id"), col("cosine"))
      .as[(Long, Long, Double)].collect()
      .map { case (q, id, c) => (q, id) -> c }.toMap
    val reranked = Similarity.pqTopK(rest, queries, 10, m = 4,
        codesPerSub = 16)
      .select(col("query_id"), col("vec_id"), col("score"))
      .as[(Long, Long, Double)].collect()
    val rerankErrs = reranked.collect {
      case (q, id, s) if exact.contains((q, id)) =>
        math.abs(s - exact((q, id)))
    }
    assert(rerankErrs.nonEmpty && rerankErrs.max < 1e-6)
    val raw = Similarity.pqTopK(rest, queries, 10, m = 4, codesPerSub = 16,
        rerank = false)
      .select(col("query_id"), col("vec_id"), col("score"))
      .as[(Long, Long, Double)].collect()
    val adcErrs = raw.collect {
      case (q, id, s) if exact.contains((q, id)) =>
        math.abs(s - exact((q, id)))
    }
    assert(adcErrs.nonEmpty && adcErrs.max < 0.15,
      s"max |adc - cos| = ${adcErrs.max}")
  }
}
