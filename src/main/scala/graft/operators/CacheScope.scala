package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage discipline for long-lived JVMs composing the heavy pipeline
  * operators. The Dedup/Curation/Components internals persist (or
  * local-checkpoint) intermediates that only session end or
  * `spark.catalog.clearCache()` would otherwise release — fine under the
  * one-shot driver contract, a storage leak in a serving process that
  * runs pipelines back to back.
  *
  * [[scoped]] brackets one pipeline: it snapshots the session's
  * persistent-RDD ids, builds the result, hands it to `use` while every
  * internal persist is still alive (so the caller's ONE materialization
  * pays no recompute), and in `finally` unpersists exactly the RDDs the
  * scope created — including those persisted deep inside nested
  * operators, which no per-call-site try/finally could reach.
  *
  * Granularity contract: one scope per session at a time. The id-set
  * difference attributes every persist created between entry and exit to
  * this scope; concurrent pipelines in the same session would have their
  * in-flight caches released (persists recompute; local checkpoints
  * would fail). That matches the operators' own synchronous contract.
  */
object CacheScope {

  /** Build a pipeline result, consume it, release every persistent RDD
    * the scope created. Returns `use`'s value. */
  def scoped[T](spark: SparkSession)(build: => DataFrame)(
      use: DataFrame => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try use(build)
    finally {
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = false)
      }
    }
  }
}
