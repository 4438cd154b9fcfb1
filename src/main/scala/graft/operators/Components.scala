package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair table — turns the near-duplicate PAIR
  * output of the `Dedup` family (minhash/simhash/Jaccard/embedding) and of
  * `DuplicationDetection` into duplicate CLUSTERS, the shape the reference
  * materialises in its `duplicates` table (cluster representative + members,
  * `tool/DuplicationDetection.scala:560-600` in
  * /root/reference/src/main/scala/au/org/ala/biocache/).
  *
  * Algorithm: distributed min-label propagation. Every node starts labelled
  * with itself; each round joins labels across edges and keeps the minimum
  * label seen; convergence when no label changes. Rounds are O(graph
  * diameter) — near-dup graphs are dense blobs with tiny diameter, so this
  * converges in a handful of rounds even at 100 TB (each round is one
  * shuffle of the label table keyed by node, never an all-pairs step). A
  * hard `maxIterations` bounds adversarial path graphs; label tables are
  * persisted per round and `localCheckpoint` truncates the lineage so the
  * plan does not grow exponentially with rounds.
  */
object Components {

  /** (node, component) for every node appearing in `pairs`; the component
    * id is the minimum node id in the component (deterministic). */
  def connectedComponents(pairs: DataFrame, idACol: String, idBCol: String,
      maxIterations: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    // undirected: keep both orientations so min labels flow either way —
    // via explode, NOT union(pairs, pairs.swapped): a union evaluates the
    // (potentially expensive) upstream pair pipeline once per branch when
    // the persist first fills; the explode scans it exactly once.
    // No distinct(): the min aggregates below are duplicate-tolerant, and
    // deduplicating the edge table would cost a full extra shuffle.
    val edges = pairs
      .select(explode(array(
        struct(col(idACol).as("src"), col(idBCol).as("dst")),
        struct(col(idBCol).as("src"), col(idACol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Fold the first propagation round into initialisation: every node (=
    // every dst, since both orientations are present) starts at
    // min(self, min direct neighbour) — one groupBy instead of a
    // distinct + a full join round.
    var labels = edges.groupBy(col("dst"))
      .agg(min(col("src")).as("_minNbr"))
      .select(col("dst").as("node"),
        least(col("dst"), col("_minNbr")).as("component"))
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (iter < maxIterations && !converged) {
      // candidate labels arriving over edges, merged with the current label
      val viaEdges = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(min("component").as("viaEdge"))
      // carry the changed flag through the eager checkpoint so convergence
      // is a cheap scan of materialized partitions, not a second recompute
      val hooked = labels.join(viaEdges, Seq("node"), "left")
        .select(col("node"),
          least(col("component"), coalesce(col("viaEdge"), col("component")))
            .as("component"),
          (col("viaEdge") < col("component")).as("_changed"))
      // pointer jumping (path doubling) from round 2 on: label(x) :=
      // label(label(x)). Sound — a label is always a node id inside x's
      // component (so it IS a key in the table) and labels only ever
      // tighten toward the component min; composing the map can't cross
      // components. Turns long-chain graphs (MST component graphs, path
      // graphs) from O(diameter) rounds into O(log diameter); round 1
      // skips it because small-diameter graphs (near-dup clusters) have
      // already converged by then and shouldn't pay the extra join.
      val next = (if (iter == 0) hooked
        else hooked
          .join(hooked.select(col("node").as("component"),
            col("component").as("_jmp")), Seq("component"), "left")
          .select(col("node"),
            coalesce(col("_jmp"), col("component")).as("component"),
            (col("_changed") || col("_jmp") < col("component"))
              .as("_changed")))
        .localCheckpoint(true)
      converged = next.filter(col("_changed")).isEmpty
      labels = next.drop("_changed")
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Cluster summary in the reference's duplicates-table shape: one row per
    * component with its representative (min id) and member count. */
  def clusterSummary(pairs: DataFrame, idACol: String, idBCol: String): DataFrame =
    connectedComponents(pairs, idACol, idBCol)
      .groupBy(col("component").as("representative"))
      .agg(count(lit(1)).as("n_members"),
        max("node").as("max_member"))
}
