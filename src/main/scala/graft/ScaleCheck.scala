package graft

/** One-command scale-correctness gate — `sbt scaleCheck`:
  *
  *   1. derive a k× (default 10×) dataset from the sf0.1 testdata with
  *      [[ScaleGen]] (skipped if the derived set already exists under
  *      tmp/ — delete it to force a fresh derivation),
  *   2. run the 12-query representative oracle subset through
  *      [[Verify]] AT the derived scale,
  *   3. replay each oracle in DuckDB over the same derived tables via
  *      tools/selfcheck.py and exit nonzero on any mismatch.
  *
  * Round 9 proved scale correctness by hand exactly once (12 queries at
  * sf1, green); as a task the gate can't rot between rehearsals — any
  * operator change that breaks 10× behaviour fails `sbt scaleCheck`
  * the same way `sbt test` fails on a unit regression.
  *
  * Usage: runMain graft.ScaleCheck [srcDir=/root/testdata/sf0.1] [k=10]
  */
object ScaleCheck {

  /** The representative subset: one query per operator family (facet
    * aggregation, anti-join, window top-k, keyed lookup, edit-distance
    * linkage, HLL audit, count-min frequency sketch, incremental-dedup
    * splice, t-digest audit, Borůvka invariants, sessionization, label
    * propagation — widened in round 12 with the four families the gate
    * had not yet represented: graph traversal q173 BFS, streaming
    * session assembly q182, time-range window analytics q86, and the
    * end-to-end curation capstone q65, all with linear-feasible DuckDB
    * replays), chosen so every oracle stays feasible at 10× AND
    * non-degenerate there (q101 heavy-hitters was swapped out: the
    * rehearsal data's per-copy word decorrelation fragments every word
    * below the n/k threshold, so both engines agree on an EMPTY result —
    * a vacuous row; the count-min matrix keeps all 256 content-addressed
    * cells populated at any scale). */
  val Subset: Seq[String] = Seq(
    "q1_agg", "q7_anti_join", "q9_window_topk", "q24_keyed_lookup",
    "q36_blocked_levenshtein", "q64_sessionize", "q65_curate_corpus",
    "q86_rolling_time", "q90_approx_distinct",
    "q129_incremental_dedup", "q147_count_min", "q173_bfs_hops",
    "q182_stream_sessions", "q219_tdigest_quantiles",
    "q222_label_propagation", "q234_boruvka_msf")

  /** At k ≥ 100 two ORACLES (not operators) become infeasible and are
    * swapped for same-family stand-ins whose replays stay linear
    * (measured on the derived 100× set, 8 DuckDB threads):
    *
    *   - q36 → q120: the q36 oracle is the literal quadratic pair scan —
    *     Σ_b C(n_b, 2) levenshtein() calls, ~45G at 100× (450M already
    *     dominated the 10× gate at ~23 min) — while the Spark side stays
    *     subquadratic via the SymSpell deletion-variant join. q120
    *     (sorted-neighborhood linkage) has window-bounded fan-out
    *     (≤3 pairs/row): 78 s at 100×.
    *   - q234 → q177: the q234 oracle is a WITH RECURSIVE transitive
    *     closure per weight threshold (killed at 28 CPU-min at 100×);
    *     the Borůvka operator itself iterates bounded pointer-jumping
    *     rounds. q177 (portable-md5 MinHash LSH) replays the FULL
    *     banding + exact-Jaccard verify in DuckDB — the dedup
    *     centerpiece hash-gated at 100×: 117 s, 25,582 rows.
    *
    * Both swapped-out queries keep their oracle gates at 10×/30× and are
    * still MEASURED (perf) at 100× in the heavy-10 sweep (SURVEY §9.4). */
  def subsetFor(k: Int): Seq[String] =
    if (k >= 100) Subset.map {
      case "q36_blocked_levenshtein" => "q120_sorted_neighborhood"
      case "q234_boruvka_msf" => "q177_minhash_portable"
      case q => q
    } else Subset

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 10
    val subset = subsetFor(k)
    val dest = s"tmp/scalecheck_${k}x"
    val out = s"tmp/scalecheck_${k}x_out"
    if (!new java.io.File(s"$dest/lineitem.parquet").exists()) {
      println(s"[scalecheck] deriving ${k}x dataset at $dest ...")
      ScaleGen.main(Array(src, dest, k.toString))
    } else
      println(s"[scalecheck] reusing derived dataset at $dest")
    println(s"[scalecheck] running ${subset.size}-query subset at ${k}x ...")
    Verify.main((Seq(dest, out) ++ subset).toArray)
    val pb = new ProcessBuilder(("python3" :: "tools/selfcheck.py" ::
      dest :: out :: subset.mkString(",") :: Nil): _*)
    pb.inheritIO()
    val rc = pb.start().waitFor()
    if (rc != 0) {
      System.err.println(s"[scalecheck] FAILED (selfcheck rc=$rc)")
      sys.exit(rc)
    }
    println(s"""{"scalecheck":"pass","k":$k,"queries":${subset.size}}""")
  }
}
