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

  test("distributed Lloyd matches a driver-side replay exactly " +
    "(same init, same tie rule)") {
    val k = 6; val iters = 3
    val got = Similarity.kmeansFitDistributed(corpus, "embedding", k,
      iterations = iters, idCol = "vec_id")
    assert(got.length == k && got.forall(_.length == dim))

    // driver-side replay with the SAME init (smallest (hash, id)) and the
    // same lowest-index tie rule — pure Scala, no Spark
    val rows = corpus
      .select(col("vec_id"), col("embedding"),
        pmod(xxhash64(col("vec_id")), lit(1000000L)).as("h"))
      .as[(Long, Seq[Float], Long)].collect()
    val vecs = rows.map(_._2.toArray)
    var cents = rows.sortBy(r => (r._3, r._1.toString)).take(k)
      .map(_._2.toArray)
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      vecs.foreach { v =>
        var best = 0; var bestSim = Double.MinValue
        for (c <- 0 until k) {
          val s = graft.functions.HashKernels.cosine(v, cents(c))
          if (s > bestSim) { bestSim = s; best = c }
        }
        counts(best) += 1
        for (d <- 0 until dim) sums(best)(d) += v(d)
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else Array.tabulate(dim)(d => (sums(c)(d) / counts(c)).toFloat)
      }
    }
    // sum order differs between executors and the replay loop; the only
    // admissible drift is float addition reassociation
    for (c <- 0 until k; d <- 0 until dim)
      assert(math.abs(got(c)(d) - cents(c)(d)) < 1e-4f,
        s"centroid $c dim $d: ${got(c)(d)} vs ${cents(c)(d)}")
    // and the resulting partitions agree
    val gotCells = Similarity.cellAssignment(corpus, "embedding", got)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    rows.foreach { case (id, v, _) =>
      val va = v.toArray
      var best = 0; var bestSim = Double.MinValue
      for (c <- 0 until k) {
        val s = graft.functions.HashKernels.cosine(va, cents(c))
        if (s > bestSim) { bestSim = s; best = c }
      }
      assert(gotCells(id) == best, s"vec $id assigned ${gotCells(id)} != $best")
    }
  }
}
