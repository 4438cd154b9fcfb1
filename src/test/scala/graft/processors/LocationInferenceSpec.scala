package graft.processors

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LocationInferenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val layers = Seq(
    ("cl927", "New South Wales",
      "POLYGON((140 -38, 154 -38, 154 -28, 140 -28, 140 -38))"),
    ("cl932", "Australia",
      "POLYGON((110 -45, 155 -45, 155 -9, 110 -9, 110 -45))"),
    ("cl1048", "1", "POLYGON((140 -38, 154 -38, 154 -28, 140 -28, 140 -38))"))
    .toDF("layerId", "value", "wkt")

  private def enriched(rows: Seq[(String, String, String, String, String)]) =
    Processors.enrichAll(
      rows.toDF("occurrenceID", "decimalLatitude", "decimalLongitude",
        "stateProvince", "country"),
      Processors.Dimensions(layers = Some(layers)))

  private def codes(df: org.apache.spark.sql.DataFrame, id: String): Seq[Int] =
    df.filter($"occurrenceID" === id).select("assertionCodes")
      .head().getSeq[Int](0)

  test("state/country/biome inferred from layers; inference assertion fires") {
    val df = enriched(Seq(("a", "-33.8", "151.2", null, null))).cache()
    val row = df.select("processed_stateProvince", "processed_country",
      "processed_biome").head()
    assert(row.getString(0) == "New South Wales")
    assert(row.getString(1) == "Australia")
    assert(row.getString(2) == "Terrestrial")
    assert(codes(df, "a").contains(21)) // COUNTRY_INFERRED_FROM_COORDINATES
  }

  test("state mismatch assertion when supplied state disagrees with layers") {
    val df = enriched(Seq(("a", "-33.8", "151.2", "Queensland", null)))
    assert(codes(df, "a").contains(18)) // STATE_COORDINATE_MISMATCH
    val ok = enriched(Seq(("b", "-33.8", "151.2", "nsw", null)))
    assert(!codes(ok, "b").contains(18)) // vocab 'nsw' == layer value
  }

  test("no coordinates: state via vocab, country via state-to-country") {
    val df = enriched(Seq(("a", null, null, "NSW", null)))
    val row = df.select("processed_stateProvince", "processed_country").head()
    assert(row.getString(0) == "New South Wales")
    assert(row.getString(1) == "Australia")
  }

  test("unknown country name asserts code 6; country code fallback resolves") {
    val df = enriched(Seq(("a", null, null, null, "Notaland")))
    assert(codes(df, "a").contains(6)) // UNKNOWN_COUNTRY_NAME
    val cc = Processors.enrichAll(
      Seq(("b", null.asInstanceOf[String], null.asInstanceOf[String], "AU"))
        .toDF("occurrenceID", "decimalLatitude", "decimalLongitude", "countryCode"),
      Processors.Dimensions(layers = Some(layers)))
    assert(cc.select("processed_country").head().getString(0) == "Australia")
  }

  test("centre-of-country and centre-of-state assertions at supplied precision") {
    val df = enriched(Seq(
      ("centre", "-29.532", "145.491", null, "Australia"),
      ("off", "-29.1", "145.1", null, "Australia")))
    assert(codes(df, "centre").contains(28)) // COORDINATES_CENTRE_OF_COUNTRY
    assert(!codes(df, "off").contains(28))
    val st = enriched(Seq(("c", "-31.253", "146.921", "NSW", null)))
    assert(codes(st, "c").contains(22)) // COORDINATES_CENTRE_OF_STATEPROVINCE
  }

  test("taxon profile join: habitat mismatch + conservation statuses (J5)") {
    val names = Seq(("frog sp", "lsid:frog", "Frog sp", "species",
      "Animalia", "Ranidae", "Rana", 10L, 20L))
      .toDF("nameLower", "taxonConceptID", "acceptedName", "taxonRank",
        "kingdom", "family", "genus", "lft", "rgt")
    val profiles = Seq(
      ("lsid:frog", Seq("Marine"), "A Frog",
        Map("Australia" -> "Endangered", "New South Wales" -> "Vulnerable",
          "global" -> "Least Concern")))
      .toDF("taxonConceptID", "habitats", "commonName", "conservation")
    val df = Processors.enrichAll(
      Seq(("a", "-33.8", "151.2", "Frog sp"))
        .toDF("occurrenceID", "decimalLatitude", "decimalLongitude", "scientificName"),
      Processors.Dimensions(names = Some(names), layers = Some(layers),
        taxonProfiles = Some(profiles))).cache()
    // marine taxon at a terrestrial point → HABITAT_MISMATCH (19), fatal
    assert(codes(df, "a").contains(19))
    assert(!df.select("geospatiallyKosher").head().getBoolean(0))
    val row = df.select("processed_countryConservation",
      "processed_stateConservation", "processed_globalConservation",
      "processed_vernacularName").head()
    assert(row.getString(0) == "Endangered")
    assert(row.getString(1) == "Vulnerable")
    assert(row.getString(2) == "Least Concern")
    assert(row.getString(3) == "A Frog")
  }

  test("species-list membership join (J12)") {
    val names = Seq(("frog sp", "lsid:frog", "Frog sp", "species",
      "Animalia", "Ranidae", "Rana", 10L, 20L))
      .toDF("nameLower", "taxonConceptID", "acceptedName", "taxonRank",
        "kingdom", "family", "genus", "lft", "rgt")
    val lists = Seq(("lsid:frog", "dr123"), ("lsid:frog", "dr456"),
      ("lsid:other", "dr999")).toDF("taxonConceptID", "listUid")
    val df = Processors.enrichAll(
      Seq(("a", "Frog sp"), ("b", "Unknown sp"))
        .toDF("occurrenceID", "scientificName"),
      Processors.Dimensions(names = Some(names), speciesLists = Some(lists)))
    val a = df.filter($"occurrenceID" === "a")
      .select("processed_speciesListUids").head().getSeq[String](0)
    assert(a == Seq("dr123", "dr456"))
    assert(df.filter($"occurrenceID" === "b")
      .select("processed_speciesListUids").head().isNullAt(0))
  }

  test("J1 name matching: exact, fuzzy misspelling, homonym by kingdom") {
    val names = Seq(
      ("macropus rufus", "lsid:roo", "Macropus rufus", "species",
        "Animalia", "Macropodidae", "Macropus", 10L, 11L),
      ("morus alba", "lsid:plant", "Morus alba", "species",
        "Plantae", "Moraceae", "Morus", 20L, 21L),
      ("morus alba", "lsid:bird", "Morus alba", "species",
        "Animalia", "Sulidae", "Morus", 30L, 31L))
      .toDF("nameLower", "taxonConceptID", "acceptedName", "taxonRank",
        "kingdom", "family", "genus", "lft", "rgt")
    val df = Processors.enrichAll(
      Seq(
        ("exact", "Macropus rufus", null),
        ("fuzzy", "Macropus ruffus", null), // one edit
        ("hom_plant", "Morus alba", "Plantae"),
        ("hom_none", "Morus alba", null),
        ("miss", "Totally unknownus", null))
        .toDF("occurrenceID", "scientificName", "kingdom"),
      Processors.Dimensions(names = Some(names))).cache()
    def row(id: String) = df.filter($"occurrenceID" === id)
      .select("processed_taxonConceptID", "processed_nameMatchMetric").head()
    assert(row("exact").getString(0) == "lsid:roo")
    assert(row("exact").getString(1) == "exactMatch")
    assert(row("fuzzy").getString(0) == "lsid:roo")
    assert(row("fuzzy").getString(1) == "fuzzyMatch")
    assert(row("hom_plant").getString(0) == "lsid:plant")
    assert(row("hom_none").isNullAt(0))
    assert(codes(df, "hom_none").contains(10006)) // HOMONYM_ISSUE
    assert(row("miss").isNullAt(0))
    assert(codes(df, "miss").contains(10004)) // NAME_NOT_RECOGNISED
  }

  test("identification qualifier classification (reference IQ processor)") {
    import graft.vocab.IdentificationQualifier._
    assert(classify("confirmed") == Certain)
    assert(classify("verified") == Certain)
    assert(classify("?") == Uncertain)
    assert(classify("cf.") == Uncertain)
    assert(classify("not confirmed") == Uncertain) // uncertain wins
    assert(classify("gibberish xyzzy") == NotRecognised)
    assert(classify(null) == NotProvided)
    assert(classify("  ") == NotProvided)
    val df = enriched(Seq(("a", null, null, null, null)))
    assert(df.columns.contains("processed_identificationQualifier"))
  }

  test("OFFLINE/REPROCESSING: offline assertions carry forward, samples reused") {
    val raw = Seq(("k1", "-33.8", "151.2"), ("k2", "-20.0", "145.0"))
      .toDF("rowKey", "decimalLatitude", "decimalLongitude")
    // previous snapshot: k1 was flagged a duplicate + outlier offline and
    // carries a sampled cl map; k2's coordinates have since changed
    val lastProcessed = Seq(
      ("k1", -33.8, 151.2, Map("cl927" -> "PrevState"),
        Seq(20014, 20, 4), "D1", "assoc|other"),
      ("k2", -10.0, 140.0, Map("cl927" -> "StaleState"),
        Seq.empty[Int], null, null))
      .toDF("rowKey", "processed_decimalLatitude", "processed_decimalLongitude",
        "cl", "assertionCodes", "processed_duplicationStatus",
        "processed_associatedOccurrences")
    val out = Processors.enrichAll(raw,
      Processors.Dimensions(layers = Some(layers),
        lastProcessed = Some(lastProcessed))).cache()
    // offline codes (20014 dup, 20 outlier) carried; non-offline (4) not
    val k1Codes = codes(out.withColumnRenamed("rowKey", "occurrenceID"), "k1")
    assert(k1Codes.contains(20014) && k1Codes.contains(20))
    assert(!k1Codes.contains(4))
    assert(out.filter($"rowKey" === "k1")
      .select("processed_duplicationStatus").head().getString(0) == "D1")
    // k1 coords unchanged -> previous cl reused (PrevState, not the layer
    // value); k2 coords changed -> freshly sampled from the layers
    val k1State = out.filter($"rowKey" === "k1")
      .select("processed_stateProvince").head().getString(0)
    assert(k1State == "PrevState")
    val k2State = out.filter($"rowKey" === "k2")
      .select("processed_stateProvince").head()
    assert(k2State.isNullAt(0)) // (-20, 145) is outside the NSW rectangle
  }

  test("dellog: deletions append by date and replay since a start date") {
    val dir = java.nio.file.Files.createTempDirectory("dellog").toString
    import graft.Store
    Store.logDeletions(Seq("a", "b").toDF("rowKey"), dir, Some("2026-01-01"))
    Store.logDeletions(Seq("c").toDF("rowKey"), dir, Some("2026-03-01"))
    val since = Store.deletedKeysSince(spark, dir, "2026-02-01")
      .collect().map(_.getString(0)).toSet
    assert(since == Set("c"))
    val all = Store.deletedKeysSince(spark, dir, "2020-01-01")
      .collect().map(_.getString(0)).toSet
    assert(all == Set("a", "b", "c"))
  }

  test("A9: enrich emits observed metrics (records / unkosher / assertions)") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val metrics = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val latch = new java.util.concurrent.CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_enrich_")) {
            metrics.put("records", row.getAs[Long]("records"))
            metrics.put("assertionsEmitted", row.getAs[Long]("assertionsEmitted"))
            latch.countDown()
          }
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      enriched(Seq(("a", "-33.8", "151.2", null, null),
        ("b", null, null, null, null))).count()
      assert(latch.await(30, java.util.concurrent.TimeUnit.SECONDS),
        "observed metrics never arrived")
      assert(metrics.get("records") == 2L)
      assert(metrics.get("assertionsEmitted") > 0L)
    } finally spark.listenerManager.unregister(listener)
  }
}
