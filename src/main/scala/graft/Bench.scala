package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Benchmark main. Two modes:
  *
  *   - **fresh-JVM sweep (default for the full run)**: the top-level
  *     process never builds a SparkSession; it forks one child JVM per
  *     batch of `SPARK_GRAFT_BATCH` (default 16) queries, each child
  *     timing its batch in a pristine heap, and merges the children's
  *     per-query reports. Rounds 7–8 proved that in-JVM fences (GC +
  *     settle + median-of-3) do NOT isolate a 254-query sweep: disk and
  *     GC debt accumulated across neighbours billed the persist-heavy
  *     dedup family 3–9× its isolated cost (BENCH_r08 vs judge re-runs).
  *     A fresh heap per small batch is the only isolation that held up.
  *     Opt out with `SPARK_GRAFT_FRESH_JVM=0`. Rows whose first attempt
  *     looks machine-contended (med ≫ min, or GC-dominated) self-heal:
  *     up to `SPARK_GRAFT_RETRY_ROUNDS` (default 2) fresh-JVM re-runs,
  *     cleanest attempt reported with a `contended` flag plus every
  *     attempt's med — the record adjudicates co-tenant load itself.
  *   - **in-process**: `SPARK_GRAFT_ONLY=q1,q2` subset runs (local
  *     iteration + what each forked child executes).
  *
  * Failure accounting: a query that throws is recorded with its error
  * string and the harness exits nonzero — a broken query can never
  * masquerade as a fast success (round-8 `catch { _ => -1L }` bug).
  * Per-query detail — `{med,min,max}` of three runs plus executor GC ms
  * and shuffle-spill bytes from a task-metrics listener — lands in
  * `BENCH_FULL.json` so bimodality and "who paid for GC" are visible;
  * stdout keeps the driver's one-line contract (median per query).
  */
object Bench {

  /** The 60 queries visible in round 6's (truncated) bench tail — kept as a
    * frozen, named subset so round-over-round deltas compare like with like
    * instead of needing tail archaeology. Do not edit: comparability is the
    * point.
    */
  val SubsetR06: Set[String] = Set(
    "q103_stream_static_join", "q104_histogram", "q105_equidepth",
    "q106_jaro_winkler", "q109_topk_operator", "q110_paragraph_dedup",
    "q111_bloom_decontaminate", "q113_blocklist", "q114_kmv_sketch",
    "q121_stream_enrich_index", "q122_poisson_bootstrap",
    "q123_permutation_test", "q124_avro_roundtrip", "q125_pmi_collocations",
    "q126_itemset_pairs", "q129_incremental_dedup", "q130_stream_incr_dedup",
    "q131_geohash_facet", "q132_raster_sample", "q134_markup_stats",
    "q135_leakage_safe_split", "q13_union", "q18_coord_round",
    "q20_fingerprint", "q21_token_count", "q24_keyed_lookup",
    "q27_jackknife_full", "q33_embed_neardup", "q39_window_frame",
    "q41_stream_agg", "q49_event_precision", "q50_loc_uncertainty",
    "q52_semantic_dedup", "q55_det_sample", "q57_gopher_quality",
    "q58_decontaminate", "q5_broadcast_join", "q62_salted_join",
    "q63_asof_join", "q64_sessionize", "q68_chunk_text",
    "q71_perplexity_filter", "q73_bigram_stats", "q74_pq_topk",
    "q75_stream_join", "q76_importance_resample", "q78_weighted_sample",
    "q79_profile", "q7_anti_join", "q82_retention", "q84_scd2",
    "q85_transitions", "q87_zscore_outliers", "q88_pivot", "q8_range_join",
    "q90_approx_distinct", "q92_inverted_index", "q97_bpe_merges",
    "q99_rrf_fusion", "q9_window_topk")

  /** One query's measurement. Times in seconds; err is None on success
    * (on error, med/min/max hold the single failing attempt's elapsed).
    * `contended` marks a row whose FIRST fresh-JVM attempt tripped the
    * contention detector and was re-run ([[selfHeal]]); `attempts` then
    * carries every attempt's med (the reported med is the cleanest) so
    * the discarded numbers stay on the record. */
  final case class QResult(name: String, med: Double, min: Double,
      max: Double, gcMs: Long, spillBytes: Long, err: Option[String],
      contended: Boolean = false, attempts: Seq[Double] = Nil,
      baseMed: Option[Double] = None)

  /** Per-child-JVM load evidence: 1-min loadavg at batch start/end and
    * the child's own process CPU seconds. Emitted as a `batches` array in
    * BENCH_FULL.json so a contended sweep is LABELLED by data — the
    * round-10 adjudication gap (judge vs builder numbers diverged 1.5×
    * with no machine-load evidence on the record). */
  final case class BatchMeta(tag: String, queries: Seq[String],
      wallSec: Double, cpuSec: Double, load1Start: Double,
      load1End: Double)

  private val batchMetas =
    scala.collection.mutable.ListBuffer.empty[BatchMeta]

  /** 1-min loadavg from /proc/loadavg; -1 where unreadable (non-Linux). */
  private def load1(): Double =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** This JVM's total process CPU seconds (for the child meta report). */
  private def processCpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  /** Per-query meds of the LAST COMMITTED clean record (BENCH_FULL.json
    * at process start, before this run overwrites it). The uniform-
    * contention test compares each fresh row against these: sustained
    * co-tenant load inflates min together with med, so the med≫min ratio
    * test can never fire (round-10 q195: 71.5 s med, 37.6 s min, same
    * code committed clean at 6.1 s — no flag). Override the path with
    * SPARK_GRAFT_BASELINE; absent/unreadable → empty map (no new flags,
    * detector degrades to the ratio+GC tests). */
  private lazy val committedMeds: Map[String, Double] = {
    val path = sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BENCH_FULL.json")
    try parseCommittedMeds(java.nio.file.Files.readString(
      java.nio.file.Paths.get(path)))
    catch { case _: Throwable => Map.empty }
  }

  /** The committed record's core count, if it carries one. Round-12
    * post-mortem: the vs-committed uniform-contention test compared an
    * 8-core session against a 32-core record and mass-flagged 32 rows;
    * each flag buys fresh-JVM re-runs, and the retry wall is what blew
    * the driver's 32-core budget (BENCH_r12 rc=124). Records older than
    * round 13 carry no `cpus` field → None → the vs-committed test is
    * skipped entirely (conservative: the other two detectors still run). */
  private lazy val committedCpus: Option[Int] = {
    val path = sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BENCH_FULL.json")
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(
          java.nio.file.Paths.get(path)))
      val c = root.path("cpus")
      if (c.isNumber) Some(c.asInt()) else None
    } catch { case _: Throwable => None }
  }

  /** The canary query: cheap, scan+agg-shaped, first in the sweep. Its
    * med ratio vs the committed record estimates uniform machine slowness
    * (the r12 sandbox ran it 0.69–1.0 s vs the committed 0.26 s — 2.7–4×
    * slower across the board, not contention). */
  private val CanaryQuery = "q1_agg"

  /** Whether the vs-committed uniform-contention test may fire this run:
    * only when the committed record was taken at the SAME core count and
    * the canary's fresh med is within 2× of its committed med (i.e. the
    * machine is comparably fast). Otherwise every ratio in the record is
    * expected to be off and flagging on it only burns retry wall. */
  private def vsCommittedEnabled(initial: Seq[QResult]): Boolean =
    vsCommittedAllowed(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt,
      committedCpus,
      committedMeds.get(CanaryQuery),
      initial.find(_.name == CanaryQuery).filter(_.err.isEmpty).map(_.med))

  /** Pure decision for the gate above — spec-pinned in
    * BenchBaselineSpec. */
  private[graft] def vsCommittedAllowed(sessionCpus: Int,
      recordCpus: Option[Int], canaryBase: Option[Double],
      canaryNow: Option[Double]): Boolean = {
    if (!recordCpus.contains(sessionCpus)) return false
    (canaryBase, canaryNow) match {
      case (Some(base), Some(now)) if base > 0.05 => now <= 2.0 * base
      case _ => false // no canary on either side → can't calibrate → skip
    }
  }

  /** Parse the committed record's per-query meds out of a BENCH_FULL.json
    * text — a REAL JSON parse (Jackson, already on the classpath via
    * Spark), not the round-11 regex: any drift in the detail format now
    * yields an empty map that the record makes VISIBLE (the emitted
    * `baseline_rows` field — a silently-empty baseline was the uniform-
    * contention detector's last blind spot). Returns empty on any parse
    * failure or when `detail` is absent/not an object. */
  private[graft] def parseCommittedMeds(text: String): Map[String, Double] = {
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(text)
      val detail = root.path("detail")
      if (!detail.isObject) Map.empty
      else {
        val b = Map.newBuilder[String, Double]
        detail.fields().forEachRemaining { e =>
          val med = e.getValue.path("med")
          if (med.isNumber) b += e.getKey -> med.asDouble()
        }
        b.result()
      }
    } catch { case _: Throwable => Map.empty }
  }

  private def f3(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }

  def main(args: Array[String]): Unit = {
    // probe child: run the serving-latency probe alone, report through
    // the TSV side-channel file, and exit — keeps the parent's
    // fresh-JVM isolation contract (the parent never builds a session)
    if (sys.env.contains("SPARK_GRAFT_PROBE")) {
      val sfDir =
        sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir",
          java.nio.file.Files.createTempDirectory("graft_probe_wh")
            .toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "1000").toInt
      val json = ServingProbe.run(spark, sfDir, n)
      sys.env.get("SPARK_GRAFT_OUT").foreach(p =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json))
      spark.stop()
      return
    }
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val freshJvm = only.isEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_FRESH_JVM", "1") != "0"
    val wall0 = System.nanoTime()
    val results: Seq[QResult] =
      if (freshJvm) runFreshJvmSweep() else runInProcess(only)
    val wall = (System.nanoTime() - wall0) / 1e9
    report(results, wall, freshJvm)
    if (results.exists(_.err.isDefined)) sys.exit(1)
  }

  /** The bench surface, plus — under `SPARK_GRAFT_INJECT_FAIL=1` — one
    * synthetic always-throwing query: the harness's own failure
    * accounting (err recorded, nonzero exit, child→parent propagation)
    * must be testable without breaking a real query. */
  private def allQueries
      : Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
    SparkEntry.queries.toSeq ++
      (if (sys.env.contains("SPARK_GRAFT_INJECT_FAIL"))
        Seq("q_injected_fail" -> ((_: SparkSession, _: String) =>
          throw new RuntimeException("injected failure for harness test")))
      else Nil)

  // ───────────────────────── in-process measurement ──────────────────────

  private def runInProcess(only: Set[String]): Seq[QResult] = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // shuffles sized to the DATA ([[Tuning]]): derived from sfDir bytes,
    // env override wins — partition count per core is only right at the
    // record SF
    val shufflePartitions = Tuning.shufflePartitions(sfDir, cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-query executor GC + spill attribution: task-metrics listener,
    // snapshot the counters around each query's three runs. Events are
    // delivered async — the 100 ms fence sleep absorbs the tail.
    val gcMs = new AtomicLong(0L)
    val spillBytes = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          gcMs.addAndGet(m.jvmGCTime)
          spillBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      }
    })

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case t: Throwable =>
          Some((t.getClass.getSimpleName + ": " +
            Option(t.getMessage).getOrElse("")).take(200))
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (dt, err)
    }

    // Per-query isolation: a GC + settle fence before each query, then the
    // MEDIAN of three runs — discards the one cold (JIT/codegen/footer
    // cache) run and any one stray GC pause. NOTE (round 9): this fence is
    // necessary but NOT sufficient across a 254-query sweep; the fresh-JVM
    // mode above is what isolates the record run.
    def fence(): Unit = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(100)
    }

    val out = allQueries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        fence()
        val gc0 = gcMs.get(); val sp0 = spillBytes.get()
        // SPARK_GRAFT_RUNS=1 for scale rehearsals where a single timing
        // per query is enough (sf1 sweeps); default median-of-3
        val nRuns = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
        val (t1, e1) = runOnce(fn)
        val runs =
          if (e1.isDefined) Seq((t1, e1)) // broken: don't pay for more
          else Seq((t1, e1)) ++ (2 to nRuns).map(_ => runOnce(fn))
        Thread.sleep(100) // let async task-end events drain
        val times = runs.map(_._1).sorted
        QResult(name, times(times.size / 2), times.head, times.last,
          gcMs.get() - gc0, spillBytes.get() - sp0,
          runs.flatMap(_._2).headOption)
      }.toSeq
    // forked children report to the parent through a TSV side-file; the
    // trailing #meta line carries the child's own CPU seconds + loadavg
    // so the parent can label contended batches with load evidence
    sys.env.get("SPARK_GRAFT_OUT").foreach { path =>
      val rows = out.map { r =>
        Seq(r.name, f3(r.med), f3(r.min), f3(r.max), r.gcMs.toString,
          r.spillBytes.toString,
          r.err.map(_.replaceAll("[\\t\\n\\r]", " ")).getOrElse("-"))
          .mkString("\t")
      } :+ Seq("#meta", f3(processCpuSec()), f3(load1())).mkString("\t")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        rows.mkString("", "\n", "\n"))
    }
    spark.stop()
    out
  }

  // ───────────────────────── fresh-JVM sweep (parent) ────────────────────

  /** Forks one child JVM per batch of queries; each child runs
    * [[runInProcess]] on its batch (SPARK_GRAFT_ONLY) and reports rows
    * through a TSV file. Child stdout/stderr go to target/bench-logs/ so
    * the parent's final JSON line is the only thing on this process's
    * stdout. A child that dies without reporting marks every unreported
    * query in its batch as failed — loudly, never silently. Rows whose
    * first attempt looks machine-contended are re-run by [[selfHeal]]. */
  private def runFreshJvmSweep(): Seq[QResult] = {
    val sweep0 = System.nanoTime()
    // SPARK_GRAFT_SWEEP_ONLY restricts the sweep but keeps the fresh-JVM
    // + self-heal machinery (unlike SPARK_GRAFT_ONLY, which switches to
    // in-process) — for harness smoke tests and targeted re-measurement
    val sweepOnly = sys.env.get("SPARK_GRAFT_SWEEP_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val names = allQueries.map(_._1)
      .filter(n => sweepOnly.isEmpty || sweepOnly(n))
    val batchSize = sys.env.getOrElse("SPARK_GRAFT_BATCH", "16").toInt
      .max(1)
    val logDir = java.nio.file.Paths.get("target", "bench-logs")
    java.nio.file.Files.createDirectories(logDir)
    // scale-rehearsal guard: a hidden superlinearity must cost minutes,
    // not hours — a timed-out batch is killed and its unreported queries
    // surface as loud failures. Round-13: DEFAULTS to 300 s per batch
    // (the r11 clean sweep averaged ~70 s/batch; 300 s is 4× headroom on
    // a 3×-slower sandbox) so the sweep always has an internal deadline
    // and can never die silently by external `timeout` with nothing on
    // stdout (BENCH_r12 rc=124). 0 or negative disables the limit.
    val timeoutSec =
      sys.env.get("SPARK_GRAFT_BATCH_TIMEOUT_SEC").map(_.toLong)
        .orElse(Some(300L)).filter(_ > 0)
    val initial = names.grouped(batchSize).toSeq.zipWithIndex.flatMap {
      case (batch, bi) =>
        val reported = forkBatch(batch, s"batch$bi", logDir, timeoutSec)
        batch.map { n =>
          reported.getOrElse(n,
            QResult(n, 0.0, 0.0, 0.0, 0L, 0L,
              Some(s"child JVM (batch $bi) exited without reporting")))
        }
    }
    // full sweeps also record the serving-latency probe (own child JVM);
    // a probe failure must never fail the sweep — it reports as absent
    if (sweepOnly.isEmpty &&
        sys.env.getOrElse("SPARK_GRAFT_PROBE_SKIP", "0") != "1")
      try probeJson = Some(forkProbe(logDir))
      catch { case _: Throwable => () }
    // round-12 (VERDICT r11 item 6): optional MULTI-SCALE probe —
    // SPARK_GRAFT_PROBE_DIRS names extra data dirs (the 10×/100×
    // rehearsal sets); each gets its own probe child, and the set lands
    // under "serving_probe_scales" keyed by dir so the S10 flatness
    // contract (bucket-pruned p99 near-flat across decades while the
    // plain layout degrades) is measured data, not a design claim.
    if (sweepOnly.isEmpty)
      sys.env.get("SPARK_GRAFT_PROBE_DIRS").foreach { dirs =>
        val entries = dirs.split(",").map(_.trim).filter(_.nonEmpty)
          .zipWithIndex.flatMap { case (d, i) =>
            try Some("\"" + jsonEscape(d) + "\":" +
              forkProbe(logDir, Some(d), s"probe_scale$i"))
            catch { case _: Throwable => None }
          }
        if (entries.nonEmpty)
          probeScalesJson = Some(entries.mkString("{", ",", "}"))
      }
    selfHeal(initial, logDir, timeoutSec,
      (System.nanoTime() - sweep0) / 1e9)
  }

  /** JSON from the serving-probe child (full sweeps only). */
  @volatile private var probeJson: Option[String] = None

  /** JSON map dir → probe stats for the multi-scale probe, if run. */
  @volatile private var probeScalesJson: Option[String] = None

  /** Fork the serving-probe child JVM, return its JSON fragment.
    * `sfDirOverride` points the child at a different data dir (the
    * multi-scale probe); default is the sweep's own SF dir. */
  private def forkProbe(logDir: java.nio.file.Path,
      sfDirOverride: Option[String] = None,
      tag: String = "probe"): String = {
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    val outFile = java.nio.file.Files.createTempFile("bench_probe", ".json")
    val pb = new ProcessBuilder((Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", sys.props("java.class.path"), "graft.Bench")).asJava)
    pb.environment().put("SPARK_GRAFT_PROBE", "1")
    pb.environment().put("SPARK_GRAFT_OUT", outFile.toString)
    sfDirOverride.foreach(d =>
      pb.environment().put("SPARK_GRAFT_SF_DIR", d))
    pb.redirectOutput(logDir.resolve(s"$tag.out").toFile)
    pb.redirectErrorStream(true)
    pb.start().waitFor()
    val json = java.nio.file.Files.readString(outFile).trim
    java.nio.file.Files.deleteIfExists(outFile)
    require(json.startsWith("{"), s"probe reported no JSON: '$json'")
    json
  }

  /** Fork one child JVM for `batch`, collect its TSV report. */
  private def forkBatch(batch: Seq[String], tag: String,
      logDir: java.nio.file.Path,
      timeoutSec: Option[Long]): Map[String, QResult] = {
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    val cp = sys.props("java.class.path")
    val outFile = java.nio.file.Files.createTempFile(s"bench_$tag", ".tsv")
    val cmd = (Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", cp, "graft.Bench")).asJava
    val pb = new ProcessBuilder(cmd)
    pb.environment().put("SPARK_GRAFT_ONLY", batch.mkString(","))
    pb.environment().put("SPARK_GRAFT_OUT", outFile.toString)
    pb.environment().put("SPARK_GRAFT_FRESH_JVM", "0")
    pb.redirectOutput(logDir.resolve(s"$tag.out").toFile)
    pb.redirectErrorStream(true)
    val loadBefore = load1()
    val wall0 = System.nanoTime()
    val proc = pb.start()
    timeoutSec match {
      case Some(t) =>
        if (!proc.waitFor(t, java.util.concurrent.TimeUnit.SECONDS)) {
          proc.destroyForcibly(); proc.waitFor()
        }
      case None => proc.waitFor()
    }
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val lines =
      try java.nio.file.Files.readAllLines(outFile).asScala.toSeq
      catch { case _: Throwable => Seq.empty[String] }
    val meta = lines.collectFirst {
      case l if l.startsWith("#meta\t") =>
        l.split("\t", -1) match {
          case Array(_, cpu, l1) =>
            BatchMeta(tag, batch, wallSec, cpu.toDouble, loadBefore,
              l1.toDouble)
          case _ => BatchMeta(tag, batch, wallSec, -1.0, loadBefore, -1.0)
        }
    }.getOrElse(
      BatchMeta(tag, batch, wallSec, -1.0, loadBefore, load1()))
    batchMetas.synchronized { batchMetas += meta }
    val reported: Map[String, QResult] = lines
      .filterNot(_.startsWith("#"))
      .flatMap { line =>
        line.split("\t", -1) match {
          case Array(n, med, mn, mx, gc, sp, err) =>
            Some(QResult(n, med.toDouble, mn.toDouble, mx.toDouble,
              gc.toLong, sp.toLong,
              if (err == "-") None else Some(err)))
          case _ => None
        }
      }.map(r => r.name -> r).toMap
    try java.nio.file.Files.deleteIfExists(outFile)
    catch { case _: Throwable => () }
    reported
  }

  // ───────────────────────── contention self-healing ─────────────────────
  //
  // Rounds 7–9 each had their record poisoned by co-tenant machine load:
  // the committed number was honest for the code but not for the machine,
  // and adjudication needed manual isolated re-runs. The detector below
  // encodes what those re-runs kept finding: a contended row either has
  // med ≫ min (one attempt ran clean, so the median is load, not code) or
  // bills multiples of its wall time to executor GC (calibrated on the r9
  // sweep, where q195 billed 324 s of GC inside a 39 s median while the
  // isolated re-run took 9.6 s).

  /** First-attempt contention test. med ≫ min needs an absolute floor
    * (sub-second queries jitter 2× from cold caches alone); the GC rule
    * fires when task-summed GC exceeds ~half the query's total CPU
    * budget (med · cpus), with floors so small queries can't trip it.
    *
    * Third test (round 11): UNIFORM contention — sustained co-tenant
    * load inflates min together with med, so neither ratio nor GC can
    * fire (proven blind spot: r10 driver q195 at 71.5 s med / 37.6 s min
    * vs the same code's committed 6.1 s). A row whose med exceeds 2.5×
    * the last committed clean record ([[committedMeds]]) is suspect
    * regardless of med/min shape, with a 0.5 s absolute floor so
    * sub-second rows can't trip on jitter, and a 0.2 s baseline floor so
    * noise-dominated tiny baselines don't amplify.
    *
    * Round-13: the vs-committed test is additionally gated by
    * `useCommitted` ([[vsCommittedEnabled]]) — it only fires when the
    * committed record was taken at this session's core count AND the
    * canary shows the machine comparably fast; a uniformly slower/
    * smaller session would otherwise mass-flag honest rows and burn the
    * sweep's wall on retries (the r12 32-core rc=124 failure mode). */
  private def looksContended(r: QResult, useCommitted: Boolean): Boolean = {
    // harness test hook (like SPARK_GRAFT_INJECT_FAIL): treat every
    // FIRST-round success as contended so the retry path is exercisable
    // without waiting for real co-tenant load
    if (sys.env.contains("SPARK_GRAFT_FORCE_CONTENDED"))
      return r.err.isEmpty && r.attempts.isEmpty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toDouble
    val vsCommitted = useCommitted && committedMeds.get(r.name).exists(b =>
      b >= 0.2 && r.med > 2.5 * b && r.med - b > 0.5)
    r.err.isEmpty && (
      (r.med > 2 * r.min && r.med - r.min > 0.3) ||
      (r.med > 1.0 && r.gcMs > 5000 &&
        r.gcMs > 0.5 * cpus * r.med * 1000) ||
      vsCommitted)
  }

  /** Re-run contended rows in fresh JVMs — up to SPARK_GRAFT_RETRY_ROUNDS
    * (default 2) extra attempts each, stopping early once a clean attempt
    * exists — and report each such query's CLEANEST attempt, flagged
    * `contended` with every attempt's med kept inline. The record then
    * self-adjudicates: either the retry found the isolated number the
    * manual re-runs used to find, or the flag + evidence says the machine
    * was busy all three times. Queries that fail stay failures — healing
    * never retries errors (a flaky error should look flaky). */
  private def selfHeal(initial: Seq[QResult],
      logDir: java.nio.file.Path,
      timeoutSec: Option[Long],
      sweepWallSec: Double): Seq[QResult] = {
    val rounds = sys.env.getOrElse("SPARK_GRAFT_RETRY_ROUNDS", "2").toInt
    // round-13: retries are bounded in WALL, not only in rounds — at most
    // 25% of the sweep's own elapsed wall may be spent re-running
    // suspects (r12's unbounded retries are what blew the driver budget).
    val retryWallCap = sys.env.get("SPARK_GRAFT_RETRY_WALL_SEC")
      .map(_.toDouble).getOrElse(0.25 * sweepWallSec)
    val retry0 = System.nanoTime()
    def retryWall(): Double = (System.nanoTime() - retry0) / 1e9
    val useCommitted = vsCommittedEnabled(initial)
    var attempts: Map[String, Seq[QResult]] =
      initial.map(r => r.name -> Seq(r)).toMap
    var suspects =
      initial.filter(looksContended(_, useCommitted)).map(_.name)
    var round = 0
    while (round < rounds && suspects.nonEmpty &&
        retryWall() < retryWallCap) {
      round += 1
      // small retry batches: re-running all suspects in one child would
      // recreate the in-JVM neighbour pressure the retry is escaping
      suspects.grouped(4).zipWithIndex
        .takeWhile(_ => retryWall() < retryWallCap)
        .foreach { case (grp, gi) =>
          forkBatch(grp, s"retry$round-$gi", logDir, timeoutSec).foreach {
            case (n, r) if r.err.isEmpty =>
              attempts = attempts.updated(n, attempts(n) :+ r)
            case _ => ()
          }
        }
      suspects = suspects.filter(n =>
        attempts(n).forall(looksContended(_, useCommitted)))
    }
    initial.map { first =>
      val as = attempts(first.name)
      if (as.size == 1) first
      else as.minBy(_.med)
        .copy(contended = true, attempts = as.map(_.med),
          baseMed = committedMeds.get(first.name))
    }
  }

  // ───────────────────────── reporting ────────────────────────────────────

  private def report(results: Seq[QResult], wall: Double,
      freshJvm: Boolean): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.contains("SPARK_GRAFT_ONLY")
    val total = results.filter(_.err.isEmpty).map(_.med).sum
    val subsetTotal =
      results.filter(r => r.err.isEmpty && SubsetR06(r.name)).map(_.med).sum
    val nerr = results.count(_.err.isDefined)
    val qs = results.map(r => "\"" + r.name + "\":" + f3(r.med))
      .mkString("{", ",", "}")
    val detail = results.map { r =>
      val e = r.err.map(m => "\"" + jsonEscape(m) + "\"").getOrElse("null")
      val cont = if (r.contended)
        ",\"contended\":true,\"attempts\":[" +
          r.attempts.map(f3).mkString(",") + "]" +
          r.baseMed.map(b => ",\"base_med\":" + f3(b)).getOrElse("")
      else ""
      "\"" + r.name + "\":{\"med\":" + f3(r.med) + ",\"min\":" + f3(r.min) +
        ",\"max\":" + f3(r.max) + ",\"gc_ms\":" + r.gcMs +
        ",\"spill_mb\":" + f3(r.spillBytes / 1e6) + ",\"err\":" + e +
        cont + "}"
    }.mkString("{", ",", "}")
    val head = s""""metric":"total","value":${f3(total)},"unit":"sec""""
    val nContended = results.count(_.contended)
    // `cpus` + `canary_med` make the NEXT run's vs-committed contention
    // test self-calibrating: it only fires against a record taken at the
    // same core count on a comparably fast machine (round-13, VERDICT r12
    // item 1 — the r12 32-core sweep died retrying rows against a record
    // from a 3× faster machine).
    val cpusNow = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val canaryMed = results.find(_.name == CanaryQuery)
      .filter(_.err.isEmpty).map(r => f3(r.med)).getOrElse("null")
    val tail = s""""nq":${results.size},"errors":$nerr,"fresh_jvm":$freshJvm,""" +
      s""""contended":$nContended,"load1":${f3(load1())},""" +
      s""""baseline_rows":${committedMeds.size},""" +
      s""""cpus":$cpusNow,"canary_med":$canaryMed,""" +
      s""""subset_r06_total":${f3(subsetTotal)},"wall":${f3(wall)},"sf":"$sfDir""""
    // Full per-query detail goes to a file: the driver's log capture keeps
    // only the last ~2000 chars of stdout, and 250+ queries don't fit.
    // SPARK_GRAFT_ONLY subset runs are local iteration aids — they must
    // not clobber the full-sweep record.
    val batchesJson = batchMetas.synchronized {
      batchMetas.map { b =>
        s"""{"tag":"${b.tag}","wall":${f3(b.wallSec)},""" +
          s""""cpu_sec":${f3(b.cpuSec)},""" +
          s""""load1_start":${f3(b.load1Start)},""" +
          s""""load1_end":${f3(b.load1End)},""" +
          b.queries.map("\"" + _ + "\"").mkString("\"queries\":[", ",", "]}")
      }.mkString("[", ",", "]")
    }
    if (!only)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
          "BENCH_FULL.json")),
        s"""{$head,"queries":$qs,"detail":$detail,""" +
          probeJson.map(p => s""""serving_probe":$p,""").getOrElse("") +
          probeScalesJson.map(p =>
            s""""serving_probe_scales":$p,""").getOrElse("") +
          s""""batches":$batchesJson,$tail}""" + "\n")
      catch { case _: Throwable => () }
    // The final stdout line must survive the 2000-char tail (plus sbt's
    // trailing "[success] ..." line), so cap it: failures first (they must
    // never be invisible), then the slowest queries — the informative ones.
    val budget = 1400
    val sb = new StringBuilder
    val ordered = results.filter(_.err.isDefined) ++
      results.filter(_.err.isEmpty).sortBy(-_.med)
    for (r <- ordered) {
      val frag = r.err match {
        case Some(m) => "\"" + r.name + "\":\"ERR " +
          jsonEscape(m.take(80)) + "\""
        case None => "\"" + r.name + "\":" + f3(r.med)
      }
      if (sb.length + frag.length + 1 < budget) {
        if (sb.nonEmpty) sb.append(',')
        sb.append(frag)
      }
    }
    println(s"""{$head,"queries":{$sb},$tail}""")
  }
}
