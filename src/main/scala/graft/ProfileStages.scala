package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc per-stage profiler for the enrich pipeline (dev tool). */
object ProfileStages {
  def micro(): Unit = {
    def bench(name: String, n: Int)(f: => Any): Unit = {
      var i = 0; while (i < n / 10) { f; i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0; while (i < n) { f; i += 1 }
      val us = (System.nanoTime() - t0) / 1e3 / n
      println(f"[micro] $name%-28s $us%8.2f us/call")
    }
    bench("dateParse ISO", 150000)(
      graft.functions.DateParser.parseDate("1996-01-02"))
    bench("dateParse dd-MMM-yyyy", 50000)(
      graft.functions.DateParser.parseDate("21-Aug-2005"))
    bench("dateParse garbage", 20000)(
      graft.functions.DateParser.parseDate("not a date at all"))
    bench("verbatimLatLong", 150000)(
      graft.functions.CoordinateParsers.parseVerbatimLatLong("35d 26' S"))
    bench("distance null-ish", 150000)(
      graft.functions.CoordinateParsers.parseDistanceMetres("14km"))
    bench("collector null", 150000)(
      graft.functions.CollectorNameParser.parse(null))
    bench("collector name", 150000)(
      graft.functions.CollectorNameParser.parse("Beauglehole, A.C."))
    bench("vocab BoR", 150000)(
      graft.vocab.BasisOfRecord.matchTerm("specimen"))
    bench("vocab state", 150000)(
      graft.vocab.StateProvinces.matchTerm("NSW"))
    bench("IQ classify", 150000)(
      graft.vocab.IdentificationQualifier.classify("cf. species"))
  }

  def planTime(spark: SparkSession, sfDir: String): Unit = {
    val fn = SparkEntry.queries("q46_enrich_pipeline")
    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val analyzed = df.queryExecution.analyzed
      val tAnalyze = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.optimizedPlan
      val tOpt = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.executedPlan
      val tPhys = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val n = df.collect().length
      val tExec = (System.nanoTime() - t0) / 1e9
      println(f"[plan] run$i analyze=$tAnalyze%.2fs optimize=$tOpt%.2fs physical=$tPhys%.2fs execute=$tExec%.2fs rows=$n")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("micro")) { micro(); return }
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("plan")) { planTime(spark, sfDir); spark.stop(); return }
    val pseudo = Tables.load(spark, sfDir, "orders").select(
      col("o_orderkey").cast("string").as("occurrenceID"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("eventDate"),
      (col("o_orderkey") % 170 - 85).cast("string").as("decimalLatitude"),
      (col("o_orderkey") % 356 - 178).cast("string").as("decimalLongitude"),
      lit("specimen").as("basisOfRecord")).cache()
    pseudo.count()

    import graft.processors.{LocationInference, Processors}
    // force-materialize every column with a hash checksum so Catalyst
    // can't prune the stage under test
    def time(name: String)(df: => DataFrame): Unit = {
      def run(): Long = df
        .select(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)).as("h"))
        .agg(coalesce(bit_xor(col("h")), lit(0L))).head().getLong(0)
      run() // warm
      val t0 = System.nanoTime()
      run()
      println(f"[stage] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    time("baseline")(pseudo)
    time("basisOfRecord")(Processors.processBasisOfRecord(pseudo))
    time("miscellaneous")(Processors.processMiscellaneous(pseudo))
    time("event")(Processors.processEvent(pseudo))
    time("location")(Processors.processLocation(pseudo))
    time("altdepth")(Processors.processAltitudeAndDepth(pseudo))
    time("identqual")(LocationInference.processIdentificationQualifier(pseudo))
    val chained = LocationInference.processIdentificationQualifier(
      Processors.processAltitudeAndDepth(Processors.processLocation(
        Processors.processEvent(Processors.processMiscellaneous(
          Processors.processBasisOfRecord(pseudo))))))
    time("chain-no-final")(chained)
    time("chain-infer")(LocationInference.inferStateCountry(chained,
      LocationInference.LayerConfig()))
    time("full-enrich")(Processors.enrich(pseudo))
    spark.stop()
  }
}
