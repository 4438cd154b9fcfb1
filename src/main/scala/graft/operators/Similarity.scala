package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
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

  /** Exact top-k by cosine for each query vector.
    * `queries` must be small (it is broadcast). Output: (query_id, id, cosine, rank). */
  private val cosUdf = udf((x: Seq[Float], y: Seq[Float]) =>
    graft.functions.HashKernels.cosine(x, y))

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(queryId), col(corpusId),
        cosUdf(col(corpusVec), col(queryVec)).as("cosine"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic centroid table: `numCells` axis-aligned pseudo-centroids
    * derived from hashing, dim-matched to the corpus. Stand-in for k-means
    * (no iterative training dependency); the IVF *plumbing* — cell
    * assignment, cell pruning, probe-limited scan — is the real thing. */
  def cellAssignment(emb: DataFrame, vecCol: String, numCells: Int): DataFrame =
    emb.withColumn("cell",
      pmod(xxhash64(transform(col(vecCol), v => round(v, 1))), lit(numCells)))

  /** IVF top-k: probe only the query's `nprobe` candidate cells.
    * At scale the corpus is pre-partitioned by cell (one-time shuffle,
    * amortised over all queries); each query touches nprobe/numCells of data. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int = 64, nprobe: Int = 8,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val celled = cellAssignment(corpus, corpusVec, numCells)
    // Query probes: its own cell plus deterministic neighbour cells.
    val probes = queries.select(col(queryId), col(queryVec),
        explode(array((0 until nprobe).map(i =>
          pmod(xxhash64(transform(col(queryVec), v => round(v, 1))) + i,
            lit(numCells))): _*)).as("cell"))
    val scored = celled.join(broadcast(probes), Seq("cell"))
      .select(col(queryId), col(corpusId),
        cosUdf(col(corpusVec), col(queryVec)).as("cosine"))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cosine").desc, col(corpusId).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
