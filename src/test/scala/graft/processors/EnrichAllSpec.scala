package graft.processors

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full dimension-backed pipeline end-to-end (every stage active). */
class EnrichAllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("enrichAll composes all stages; every dim participates") {
    val raw = Seq(
      ("dr1|r1", "dr1", "2012-03-05", "-35.26781", "149.26189",
        "Macropus rufus", "CSIRO", "ANIC", null: String),
      ("dr1|r2", "dr1", "2013-04-01", "-25.0", "135.0",
        "Plainus speciesus", "XX", "YY", "PreservedSpecimen"))
      .toDF("rowKey", "dataResourceUid", "eventDate", "decimalLatitude",
        "decimalLongitude", "scientificName", "institutionCode",
        "collectionCode", "basisOfRecord")

    val dims = Processors.Dimensions(
      names = Some(Seq(
        ("macropus rufus", "lsid:1", "Macropus rufus", "species", "Animalia",
          "Macropodidae", "Macropus", 150, 151),
        ("plainus speciesus", "lsid:2", "Plainus speciesus", "species",
          "Animalia", "Plainidae", "Plainus", 400, 401))
        .toDF("nameLower", "taxonConceptID", "acceptedName", "taxonRank",
          "kingdom", "family", "genus", "lft", "rgt")),
      defaults = Some(Seq(("dr1", "basisOfRecord", "HumanObservation"))
        .toDF("dataResourceUid", "field", "value")),
      attribution = Some(Seq(("CSIRO", "ANIC", "CSIRO", "ANIC collection"))
        .toDF("institutionCode", "collectionCode", "institutionName",
          "collectionName")),
      sensitivity = Some(Seq(("macropus rufus", 10000))
        .toDF("nameLower", "generalisationMetres")),
      speciesGroups = Some(Seq(("Mammals", 100, 200))
        .toDF("speciesGroup", "lft", "rgt")),
      countryCentres = Some(Seq(("Australia", -25.0, 135.0))
        .toDF("country", "centreLat", "centreLon")))

    val out = Processors.enrichAll(
      raw.withColumn("country", lit("Australia")), dims).cache()

    // default fills only the null basisOfRecord
    val bors = out.select($"rowKey", $"processed_basisOfRecord")
      .as[(String, String)].collect().toMap
    assert(bors("dr1|r1") == "HumanObservation")
    assert(bors("dr1|r2") == "PreservedSpecimen")

    // attribution resolved for r1, flagged unknown for r2
    val attrNames = out.select($"rowKey", $"processed_collectionName")
      .as[(String, String)].collect().toMap
    assert(attrNames("dr1|r1") == "ANIC collection")
    assert(attrNames("dr1|r2") == null)

    // sensitivity generalised r1's coordinates (10 km -> 1 dp)
    val lat1 = out.filter($"rowKey" === "dr1|r1")
      .select("processed_decimalLatitude").head().getDouble(0)
    assert(lat1 == -35.3)

    // species group from lft containment
    val groups = out.select($"rowKey", $"processed_speciesGroups")
      .as[(String, Seq[String])].collect().toMap
    assert(groups("dr1|r1") == Seq("Mammals"))
    assert(groups("dr1|r2").isEmpty)

    // centre-point assertion fires for r2 (exact country centre), fatal
    val codes = out.select($"rowKey", $"assertionCodes")
      .as[(String, Seq[Int])].collect().toMap
    assert(codes("dr1|r2").contains(28))
    assert(codes("dr1|r1").contains(20009)) // dataAreGeneralised
    val kosher = out.select($"rowKey", $"geospatiallyKosher")
      .as[(String, Boolean)].collect().toMap
    assert(!kosher("dr1|r2") && kosher("dr1|r1"))
  }
}
