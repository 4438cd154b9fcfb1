package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-13 optimization/hardening changes:
  *   - winnowHashes counts gram positions in CODE POINTS (ADVICE r12:
  *     the UTF-16 code-unit form diverged from the Spark expression form
  *     and the DuckDB oracle on supplementary-plane text),
  *   - fanOutSmallScan reads the split count from the analyzed plan's
  *     leaf scan (Spark 4's lazy reader leaves UnresolvedDataSource at
  *     the logical level — the round-13 rewrite briefly probed that and
  *     silently never fired),
  *   - candidatesFromArrays refuses non-divisible banding instead of
  *     silently dropping trailing hashes.
  */
class Round13OptSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def fixtureDocs = Seq(
    // supplementary-plane characters: each emoji is TWO UTF-16 code units
    // but ONE code point — gram boundaries must follow code points
    (1L, "the quick brown fox 😀😀 jumps over the lazy dog 🦊 again"),
    (2L, "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝔪𝔞𝔱𝔥 𝔩𝔢𝔱𝔱𝔢𝔯𝔰 are all supplementary plane here today"),
    (3L, "plain ascii control row with enough characters to window")
  ).toDF("doc_id", "text")

  test("winnow kernel ≡ relational form on SUPPLEMENTARY-PLANE text " +
      "(code-point gram positions)") {
    import org.apache.spark.sql.expressions.Window
    val k = 8; val w = 4
    val kernel = TextSearch.winnowFingerprints(fixtureDocs, "doc_id",
        "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // the relational restatement: Spark's length()/substring() count
    // code points — the committed oracle SQL replays exactly this
    val grams = fixtureDocs
      .select(col("doc_id").as("doc"),
        regexp_replace(lower(col("text")), "\\s+", " ").as("t"))
      .select(col("doc"), col("t"), (length(col("t")) - (k - 1)).as("np"))
      .filter(col("np") >= w)
      .select(col("doc"), col("np"),
        explode(sequence(lit(1), col("np"))).as("pos"), col("t"))
      .select(col("doc"), col("np"), col("pos"),
        conv(substring(md5(substring(col("t"), col("pos"), lit(k))), 1, 8),
          16, 10).cast("long").as("h"))
    val byPos = Window.partitionBy("doc").orderBy("pos")
    val withMins = grams.select(col("doc") +: col("np") +: col("pos") +:
      col("h") +: (0 until w).map { a =>
        min("h").over(byPos.rowsBetween(-a, w - 1 - a)).as(s"m$a")
      }: _*)
    val selected = (0 until w).map { a =>
      (col("pos") - a >= 1) && (col("pos") - a <= col("np") - (w - 1)) &&
        col(s"m$a") === col("h")
    }.reduce(_ || _)
    val relational = withMins.filter(selected).select("doc", "h").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(kernel == relational)
    assert(kernel.count(_._1 == 1L) > 0 && kernel.count(_._1 == 2L) > 0)
  }

  test("fanOutSmallScan fires on a sub-cores single-file scan (analyzed " +
      "plan), and not on a non-narrow plan") {
    assume(graft.SparkTestSession.fixturesPresent("0.01"))
    val df = spark.read.parquet(
      graft.SparkTestSession.sfDir("0.01") + "/customer.parquet")
    val cores = spark.sparkContext.defaultParallelism
    // narrow scan, one row group < cores splits → round-robin to cores
    assert(graft.Tuning.fanOutSmallScan(df).rdd.getNumPartitions == cores)
    // projection/filter above the scan stay narrow → still fires
    assert(graft.Tuning.fanOutSmallScan(
      df.select("c_custkey", "c_name").filter(col("c_custkey") > 10))
      .rdd.getNumPartitions == cores)
    // an aggregate below is NOT narrow → untouched plan (no new exchange)
    val agg = df.groupBy("c_nationkey").count()
    assert(graft.Tuning.fanOutSmallScan(agg).queryExecution.logical eq
      agg.queryExecution.logical)
  }

  test("candidatesFromArrays refuses non-divisible banding loudly") {
    val shArr = Dedup.wordShingleArrays(
      Seq((1L, "one two three four five six seven eight"))
        .toDF("doc_id", "text"), "doc_id", "text", 3)
    val sig = Dedup.signatureArrays(shArr, 12)
    intercept[IllegalArgumentException] {
      Dedup.candidatesFromArrays(sig, 5, 12)
    }
  }
}
