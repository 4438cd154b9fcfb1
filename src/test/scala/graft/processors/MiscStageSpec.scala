package graft.processors

import graft.SparkTestSession
import graft.model.AssertionCodes._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MISC + CLASS stage parity, case-for-case from `MiscTest.scala` in
  * /root/reference/src/test/scala/au/org/ala/biocache/. */
class MiscStageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def miscCodes(df: org.apache.spark.sql.DataFrame, id: String): Set[Int] =
    df.filter(col("occurrenceID") === id)
      .select(explode(col("assertions_misc"))).as[Int].collect().toSet

  lazy val misc = Processors.processMiscellaneous(Seq(
    // id, establishmentMeans, associatedTaxa, recordedBy, catalogNumber,
    // dataGeneralizations, identificationQualifier, identifiedBy
    ("m1", "not cultivated; not native", null, null, null, null, null, null),
    ("m2", "not cultivated; missing from vocab", null, null, null, null, null, null),
    ("m3", null, "infects:Test Species", "Beauglehole, A.C.", "XYZABC",
      "coordinates to 1dp", "cf. species", "A. Surveyor"),
    ("m4", "cultivated", null, "{}{}*&", null, null, null, null))
    .toDF("occurrenceID", "establishmentMeans", "associatedTaxa",
      "recordedBy", "catalogNumber", "dataGeneralizations",
      "identificationQualifier", "identifiedBy")).cache()

  private def field(id: String, colName: String): Any = {
    val r = misc.filter(col("occurrenceID") === id).select(colName).head()
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("establishmentMeans vocab mapping keeps matched parts (MiscTest:179)") {
    assert(field("m1", "processed_establishmentMeans") == "not cultivated; not native")
  }

  test("establishmentMeans drops unmatched parts (MiscTest:188)") {
    assert(field("m2", "processed_establishmentMeans") == "not cultivated")
  }

  test("interactions parsed from associatedTaxa (MiscTest:160)") {
    assert(field("m3", "processed_interactions")
      .asInstanceOf[scala.collection.Seq[String]].toList == List("Infects"))
  }

  test("cultivated establishmentMeans flags escapee (MiscTest:306)") {
    assert(miscCodes(misc, "m4").contains(OCCURRENCE_IS_CULTIVATED_OR_ESCAPEE.code))
    assert(!miscCodes(misc, "m1").contains(OCCURRENCE_IS_CULTIVATED_OR_ESCAPEE.code))
    // not supplied → not checked
    assert(!miscCodes(misc, "m3").contains(OCCURRENCE_IS_CULTIVATED_OR_ESCAPEE.code))
  }

  test("missing catalogue number (MiscTest:216)") {
    assert(miscCodes(misc, "m1").contains(MISSING_CATALOGUENUMBER.code))
    assert(!miscCodes(misc, "m3").contains(MISSING_CATALOGUENUMBER.code))
  }

  test("data generalised by provider (MiscTest:289)") {
    assert(miscCodes(misc, "m3").contains(DATA_ARE_GENERALISED.code))
    assert(!miscCodes(misc, "m1").contains(DATA_ARE_GENERALISED.code))
  }

  test("identification completeness checks (MiscellaneousProcessor:121-140)") {
    assert(miscCodes(misc, "m1").contains(MISSING_IDENTIFICATIONQUALIFIER.code))
    assert(miscCodes(misc, "m1").contains(MISSING_IDENTIFIEDBY.code))
    assert(!miscCodes(misc, "m3").contains(MISSING_IDENTIFICATIONQUALIFIER.code))
    assert(!miscCodes(misc, "m3").contains(MISSING_IDENTIFIEDBY.code))
  }

  test("recordedBy parses to canonical pipe-joined list (MiscTest collectors)") {
    assert(field("m3", "processed_recordedBy") == "Beauglehole, A.C.")
    assert(miscCodes(misc, "m4").contains(RECORDED_BY_UNPARSABLE.code))
    assert(!miscCodes(misc, "m3").contains(RECORDED_BY_UNPARSABLE.code))
  }

  lazy val namesDim = Seq(
    ("macropus rufus", "lsid:1", "Macropus rufus", "species", "Animalia",
      "Macropodidae", "Macropus", 100L, 101L))
    .toDF("nameLower", "taxonConceptID", "acceptedName", "taxonRank",
      "kingdom", "family", "genus", "lft", "rgt")

  lazy val classed = Processors.processClassification(Seq(
    // id, scientificName, vernacularName, taxonRank, kingdom, genus, specificEpithet
    ("c1", "Macropus rufus", null, null, null, null, null),
    ("c2", "Macropus rufus", null, "species", "ANIMALIA", null, null),
    ("c3", null, null, null, "Animals", "Macropus", "rufus"),
    ("c4", null, "Red Kangaroo", null, null, null, null),
    ("c5", "UNKNOWN", null, null, null, null, null))
    .toDF("occurrenceID", "scientificName", "vernacularName", "taxonRank",
      "kingdom", "genus", "specificEpithet"), namesDim).cache()

  private def classCodes(id: String): Set[Int] =
    classed.filter(col("occurrenceID") === id)
      .select(explode(col("assertions_class"))).as[Int].collect().toSet

  test("missing taxonRank (MiscTest:203)") {
    assert(classCodes("c1").contains(MISSING_TAXONRANK.code))
    assert(!classCodes("c2").contains(MISSING_TAXONRANK.code))
  }

  test("name not supplied: constructed/vernacular names count (MiscTest:231)") {
    assert(classCodes("c3").contains(NAME_NOT_SUPPLIED.code))
    assert(!classCodes("c4").contains(NAME_NOT_SUPPLIED.code))
    assert(!classCodes("c1").contains(NAME_NOT_SUPPLIED.code))
  }

  test("constructed genus+epithet name still matches the dim (ClassificationProcessor getExactSciName)") {
    val r = classed.filter(col("occurrenceID") === "c3")
      .select("processed_taxonConceptID").head()
    assert(r.getString(0) == "lsid:1")
  }

  test("invalid scientific name placeholder (MiscTest:251)") {
    assert(classCodes("c5").contains(INVALID_SCIENTIFIC_NAME.code))
    assert(!classCodes("c1").contains(INVALID_SCIENTIFIC_NAME.code))
  }

  test("unknown kingdom (MiscTest:270)") {
    assert(classCodes("c3").contains(UNKNOWN_KINGDOM.code))
    assert(!classCodes("c2").contains(UNKNOWN_KINGDOM.code))
  }

  // ── taxonomic-hints scope check (reference TaxonomicHintsTest) ──

  lazy val hintsDim = Seq(
    // dr1 accepts phylum a|b, kingdom k|l, class n — the reference's
    // "happy days" hint map
    ("dr1", "phylum", "A"), ("dr1", "kingdom", "K"), ("dr1", "phylum", "B"),
    ("dr1", "kingdom", "L"), ("dr1", "classs", "N"))
    .toDF("dataResourceUid", "rank", "name")

  lazy val hintNames = Seq(
    ("lbus", "lsid:h1", "Lbus", "species", "L", null, null, null, null, 1L, 2L),
    ("cbus", "lsid:h2", "Cbus", "species", "L", "C", null, null, null, 3L, 4L),
    ("abus", "lsid:h3", "Abus", "species", "L", "B", "A", null, null, 5L, 6L))
    .toDF("nameLower", "taxonConceptID", "acceptedName", "taxonRank",
      "kingdom", "phylum", "classs", "family", "genus", "lft", "rgt")

  lazy val hinted = DimensionStages.checkTaxonomicHints(
    Processors.processClassification(Seq(
      ("h1", "dr1", "Lbus"), // kingdom L, no phylum → valid (happy days)
      ("h2", "dr1", "Cbus"), // phylum C ∉ {a,b} → mismatch
      ("h3", "dr1", "Abus")) // phylum B ok, class A ∉ {n} → mismatch
      .toDF("occurrenceID", "dataResourceUid", "scientificName"),
      hintNames), hintsDim).cache()

  private def hintCodes(id: String): Set[Int] =
    hinted.filter(col("occurrenceID") === id)
      .select(explode(col("assertions_hints"))).as[Int].collect().toSet

  test("no conflicts passes (TaxonomicHintsTest:20)") {
    assert(hintCodes("h1").isEmpty)
    assert(hinted.filter(col("occurrenceID") === "h1")
      .select("processed_taxonConceptID").head().getString(0) == "lsid:h1")
  }

  test("phylum mismatch voids the match (TaxonomicHintsTest:26)") {
    assert(hintCodes("h2").contains(RESOURCE_TAXONOMIC_SCOPE_MISMATCH.code))
    assert(hinted.filter(col("occurrenceID") === "h2")
      .select("processed_taxonConceptID").head().isNullAt(0))
  }

  test("class mismatch voids the match (TaxonomicHintsTest:32)") {
    assert(hintCodes("h3").contains(RESOURCE_TAXONOMIC_SCOPE_MISMATCH.code))
  }
}
