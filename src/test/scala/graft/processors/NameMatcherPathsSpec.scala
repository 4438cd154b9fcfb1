package graft.processors

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two classification lookup paths — collect+broadcast kernel (dims
  * within [[NameMatcher.MaxBroadcastEntries]]) and the shuffled two-join
  * form (oversized dims) — must produce identical hits over the full case
  * matrix: exact, kingdom-resolved homonym, unresolved homonym, blocked
  * fuzzy (1 and 2 edits, with the lexicographic tie-break), fuzzy out of
  * block, no match, null/blank names. */
class NameMatcherPathsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val dim = Seq(
    // exact unique
    ("macropus rufus", "lsid:1", "Macropus rufus", "species", "Animalia",
      "Macropodidae", "Macropus", 100L, 101L),
    // homonym pair across kingdoms
    ("drosera", "lsid:p1", "Drosera", "genus", "Plantae",
      "Droseraceae", "Drosera", 200L, 220L),
    ("drosera", "lsid:a1", "Drosera", "genus", "Animalia",
      "Droseridae", "Drosera", 300L, 320L),
    // fuzzy family: two names one edit apart from the probe, the smaller
    // must win; one name two edits; one name in ANOTHER block
    ("acacia dealbata", "lsid:f1", "Acacia dealbata", "species", "Plantae",
      "Fabaceae", "Acacia", 400L, 401L),
    ("acacia dealbatb", "lsid:f2", "Acacia dealbatb", "species", "Plantae",
      "Fabaceae", "Acacia", 402L, 403L),
    ("acacia dealbaxx", "lsid:f3", "Acacia dealbaxx", "species", "Plantae",
      "Fabaceae", "Acacia", 404L, 405L),
    ("acacia mearnsii", "lsid:f4", "Acacia mearnsii", "species", "Plantae",
      "Fabaceae", "Acacia", 406L, 407L))
    .toDF("nameLower", "taxonConceptID", "acceptedName", "taxonRank",
      "kingdom", "family", "genus", "lft", "rgt")

  lazy val facts = Seq(
    ("e1", "Macropus rufus", null), // exact
    ("h1", "Drosera", "Plantae"),   // homonym resolved by kingdom
    ("h2", "Drosera", "Fungi"),     // homonym, wrong hint → flag
    ("h3", "Drosera", null),        // homonym, no hint → flag
    ("f1", "Acacia dealbatc", null), // 1 edit from f1 AND f2 → smaller name
    ("f2", "Acacia dealbzxy", null), // exactly 2 edits from f3 only
    ("f3", "Bcacia dealbata", null), // blockKey differs → NO fuzzy match
    ("n1", "Totally unknown", null),
    ("n2", null, "Animalia"),
    ("n3", "   ", null))
    .toDF("id", "scientificName", "kingdom")

  private def hits(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), col("_nm")).collect()
      .map(r => r.getString(0) -> Option(r.getStruct(1)).map(_.toString))
      .toMap

  test("broadcast and shuffled paths agree on the full case matrix") {
    val bcMatcher = NameMatcher.fromDataFrame(dim)
    val bc = spark.sparkContext.broadcast(bcMatcher)
    val lookupUdf = udf((name: String, kingdom: String) =>
      bc.value.lookup(name, kingdom))
    val broadcastOut = facts.withColumn("_nm",
      when(col("scientificName").isNotNull,
        lookupUdf(col("scientificName"), col("kingdom"))))
    val shuffledOut = NameMatcher.attachHitsDistributed(
      facts, col("scientificName"), col("kingdom"), dim, "_nm")
    val b = hits(broadcastOut)
    val s = hits(shuffledOut)
    assert(b.keySet == s.keySet)
    b.keySet.foreach(k => assert(b(k) == s(k), s"row $k: bc=${b(k)} sh=${s(k)}"))
    // and the matrix actually exercises every branch
    assert(b("e1").get.contains("lsid:1"))
    assert(b("h1").get.contains("lsid:p1"))
    assert(b("h2").get.contains("true")) // homonym flag
    assert(b("h3").get.contains("true"))
    assert(b("f1").get.contains("lsid:f1")) // lexicographic tie-break
    assert(b("f2").get.contains("lsid:f3"))
    assert(b("f3").isEmpty)
    assert(b("n1").isEmpty && b("n2").isEmpty && b("n3").isEmpty)
  }

  test("full pipeline via the shuffled path matches the broadcast path") {
    // drive processClassification itself down the oversized branch by
    // shrinking the bound, and compare the COMPLETE stage output —
    // processed_* columns and assertions — against the broadcast run
    val facts2 = facts.withColumnRenamed("id", "occurrenceID")
      .withColumn("taxonRank", lit("species"))
    def run(): Array[String] =
      Processors.processClassification(facts2, dim)
        .select(col("occurrenceID"), col("processed_taxonConceptID"),
          col("processed_scientificName"), col("processed_kingdom"),
          col("processed_lft"), col("processed_nameMatchMetric"),
          col("assertions_class").cast("string"))
        .collect().map(_.toString).sorted
    val broadcastRun = run()
    System.setProperty("graft.names.maxBroadcastEntries", "2")
    try {
      val shuffledRun = run()
      assert(shuffledRun.toSeq == broadcastRun.toSeq)
    } finally System.clearProperty("graft.names.maxBroadcastEntries")
  }

  test("shuffled path plan has no cartesian/nested-loop join") {
    val out = NameMatcher.attachHitsDistributed(
      facts, col("scientificName"), col("kingdom"), dim, "_nm")
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"), plan)
  }
}
