package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column.
  *
  * Two tiers:
  *  - brute-force cosine top-k: the exact baseline. One broadcast of the
  *    query set, one codegen'd scan — correct at any scale, O(n·q).
  *  - IVF (inverted-file) top-k: vectors pre-assigned to the nearest of C
  *    deterministic centroids; queries probe only `nprobe` nearest cells.
  *    Scan cost drops by ~C/nprobe; recall controlled by nprobe.
  */
object Similarity {

  /** Codegen'd cosine over array<float> columns (`plans.CosineSimilarity`):
    * stays inside whole-stage codegen, no per-row Seq boxing — the UDF form
    * cost ~6x on the near-dup pair scans. */
  private[operators] def cosineCol(df: DataFrame)(a: Column, b: Column): Column = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    graft.plans.GraftFunctions.cosine_sim(a, b)
  }

  /** Exact top-k by cosine for each query vector.
    * `queries` must be small (it is broadcast). Output: (query_id, id, cosine, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(queryId), col(corpusId),
        cosineCol(corpus)(col(corpusVec), col(queryVec)).as("cosine"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** k-means centroid training on a bounded corpus sample (Lloyd
    * iterations, deterministic seeding by id-hash order). Sample-based
    * training is the standard ANN practice at any scale: one distributed
    * pass collects ≤ `maxTrainingRows` vectors (k×dim×rows is megabytes);
    * Lloyd then runs driver-side in tight primitive loops, and only the
    * cell ASSIGNMENT — the part proportional to corpus size — stays
    * distributed. */
  def trainCentroids(corpus: DataFrame, vecCol: String, numCells: Int,
      iterations: Int = 3, idCol: String = "vec_id",
      maxTrainingRows: Int = 20000): Array[Array[Float]] = {
    // Deterministic O(scan) sample: keep rows whose id-hash falls under a
    // threshold sized from the corpus count (~1.5x over-draw), then trim to
    // maxTrainingRows in driver-side hash order. No global sort — the old
    // orderBy(xxhash64).limit shape was a full cluster sort just to sample.
    val n = corpus.count()
    val denom = 1000000L
    val keep = if (n <= maxTrainingRows) denom
      else math.min(denom, (denom * 3L * maxTrainingRows / (2L * n)).max(1L))
    val sample: Array[Array[Float]] = corpus
      .select(col(vecCol), pmod(xxhash64(col(idCol)), lit(denom)).as("_h"))
      .filter(col("_h") < keep)
      .collect()
      .sortBy(_.getLong(1))
      .take(maxTrainingRows)
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty corpus")

    var centroids = sample.take(numCells).map(_.clone())
    val dim = sample.head.length
    for (_ <- 1 to iterations) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      sample.foreach { v =>
        var best = 0; var bestSim = Double.MinValue
        var c = 0
        while (c < centroids.length) {
          val s = graft.functions.HashKernels.cosine(v, centroids(c))
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        counts(best) += 1
        var d = 0
        while (d < dim) { sums(best)(d) += v(d); d += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else Array.tabulate(dim)(d => (sums(c)(d) / counts(c)).toFloat)
      }
    }
    centroids
  }

  /** Cell assignment against trained centroids (nearest by cosine). */
  def cellAssignment(emb: DataFrame, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    val bc = emb.sparkSession.sparkContext.broadcast(centroids)
    val assignUdf = udf { (v: Seq[Float]) =>
      // one Array conversion per row, not one implicit copy per centroid
      val va = v.toArray
      var best = 0; var bestSim = Double.MinValue
      var c = 0
      while (c < bc.value.length) {
        val s = graft.functions.HashKernels.cosine(va, bc.value(c))
        if (s > bestSim) { bestSim = s; best = c }
        c += 1
      }
      best
    }
    emb.withColumn("cell", assignUdf(col(vecCol)))
  }

  /** IVF top-k: probe only each query's `nprobe` nearest centroid cells.
    * At scale the corpus is pre-partitioned by cell (one-time shuffle,
    * amortised over all queries); each query touches nprobe/numCells of
    * data, and recall is controlled by nprobe. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int = 64, nprobe: Int = 8, iterations: Int = 2,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val centroids = trainCentroids(corpus, corpusVec, numCells,
      iterations, corpusId)
    val celled = cellAssignment(corpus, corpusVec, centroids)
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    val probeUdf = udf { (v: Seq[Float]) =>
      val va = v.toArray
      bc.value.indices
        .map(c => c -> graft.functions.HashKernels.cosine(va, bc.value(c)))
        .sortBy(-_._2).take(nprobe).map(_._1)
    }
    val probes = queries.select(col(queryId), col(queryVec),
      explode(probeUdf(col(queryVec))).as("cell"))
    val scored = celled.join(broadcast(probes), Seq("cell"))
      .select(col(queryId), col(corpusId),
        cosineCol(corpus)(col(corpusVec), col(queryVec)).as("cosine"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
