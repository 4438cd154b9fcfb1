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

  /** Self-releasing variant for LAZY entry points that persist internals:
    * the returned DataFrame carries an `observe` marker, and a one-shot
    * [[org.apache.spark.sql.util.QueryExecutionListener]] unpersists
    * `caches` the first time any action drives a plan containing that
    * marker (success OR failure). The caller's first materialization
    * still reads the caches warm; afterwards the session holds no leaked
    * storage — the long-lived-JVM contract the plain (non-`*Scoped`)
    * linkage entry points promise.
    *
    * Re-materializing the returned frame after the first action
    * recomputes the released internals (correct, just cold) — and since
    * the listener already knows, the SECOND materialization logs a
    * one-shot WARN pointing at the `*Scoped` form, so the footgun is
    * loud instead of a silent slowdown; callers that drive a result
    * repeatedly should bracket with [[scoped]] instead. The listener
    * matches the exact marker name in the analyzed plan, so unrelated
    * queries on the session never trigger an early release or a false
    * warning. */
  def releaseOnFirstMaterialization(result: DataFrame,
      caches: Seq[DataFrame]): DataFrame = {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val spark = result.sparkSession
    val marker = "graft_release_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val observed = result.observe(marker,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    val listener = new QueryExecutionListener {
      // 0 = caches warm, 1 = released, 2 = recompute warned + detached
      private val state = new java.util.concurrent.atomic.AtomicInteger(0)
      private def hasMarker(qe: QueryExecution): Boolean =
        qe.analyzed.collectFirst {
          case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
              if c.name == marker => c
        }.nonEmpty
      private def advance(qe: QueryExecution): Unit =
        if (hasMarker(qe)) {
          if (state.compareAndSet(0, 1))
            caches.foreach(_.unpersist(blocking = false))
          else if (state.compareAndSet(1, 2)) {
            recomputeWarnSink(
              "second materialization of a releaseOnFirstMaterialization " +
                "result recomputed its released internals cold; bracket " +
                "repeated consumption with the *Scoped entry point or " +
                "CacheScope.scoped instead")
            spark.listenerManager.unregister(this)
          }
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = advance(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = advance(qe)
    }
    spark.listenerManager.register(listener)
    observed
  }

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger(CacheScope.getClass)

  /** Where the one-shot recompute warning goes — a WARN log in
    * production; specs swap it to count invocations. */
  private[graft] var recomputeWarnSink: String => Unit =
    msg => log.warn(msg)
}
