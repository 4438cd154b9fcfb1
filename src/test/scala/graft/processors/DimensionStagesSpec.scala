package graft.processors

import graft.SparkTestSession
import graft.sources.DwcaExport
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DimensionStagesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("default values fill nulls only") {
    val df = Seq(("r1", "dr1", null: String), ("r2", "dr1", "supplied"))
      .toDF("rowKey", "dataResourceUid", "basisOfRecord")
    val defaults = Seq(("dr1", "basisOfRecord", "HumanObservation"))
      .toDF("dataResourceUid", "field", "value")
    val out = DimensionStages.applyDefaultValues(df, defaults)
      .select("rowKey", "basisOfRecord").as[(String, String)].collect().toMap
    assert(out("r1") == "HumanObservation" && out("r2") == "supplied")
  }

  test("attribution join resolves names, flags unknown codes") {
    val df = Seq(("r1", "CSIRO", "ANIC"), ("r2", "XX", "YY"))
      .toDF("rowKey", "institutionCode", "collectionCode")
    val dim = Seq(("CSIRO", "ANIC", "CSIRO", "Australian National Insect Collection"))
      .toDF("institutionCode", "collectionCode", "institutionName", "collectionName")
    val out = DimensionStages.processAttribution(df, dim)
    val r1 = out.filter($"rowKey" === "r1")
      .select("processed_collectionName").head().getString(0)
    assert(r1 == "Australian National Insect Collection")
    val r2codes = out.filter($"rowKey" === "r2")
      .select(explode($"assertions_attr")).as[Int].collect().toSet
    assert(r2codes == Set(20005, 20006))
  }

  test("sensitivity generalises coordinates and stashes originals") {
    val df = Seq(("r1", "Macropus rufus", -35.26781, 149.26189),
      ("r2", "Common species", -35.26781, 149.26189))
      .toDF("rowKey", "processed_scientificName",
        "processed_decimalLatitude", "processed_decimalLongitude")
    val dim = Seq(("macropus rufus", 10000)).toDF("nameLower", "generalisationMetres")
    val out = DimensionStages.processSensitivity(df, dim)
    val r1 = out.filter($"rowKey" === "r1").select(
      "processed_decimalLatitude", "isSensitive").head()
    assert(r1.getDouble(0) == -35.3)
    assert(r1.getBoolean(1))
    val orig = out.filter($"rowKey" === "r1")
      .select("originalSensitiveValues").as[Map[String, String]].head()
    assert(orig("decimalLatitude") == "-35.26781")
    val r2 = out.filter($"rowKey" === "r2").select(
      "processed_decimalLatitude", "isSensitive").head()
    assert(r2.getDouble(0) == -35.26781 && !r2.getBoolean(1))
    // masked vs authorised projection
    val masked = DimensionStages.maskSensitive(out, includeSensitive = false)
    assert(!masked.columns.contains("originalSensitiveValues"))
    val full = DimensionStages.maskSensitive(out, includeSensitive = true)
    assert(full.filter($"rowKey" === "r1")
      .select("processed_decimalLatitude").head().getDouble(0) == -35.26781)
  }

  test("state-centre dim check matches at supplied precision") {
    val df = Seq(
      // 1-dp coords equal the NSW centre rounded to 1 dp -> fires
      ("r1", "New South Wales", "-31.3", "146.9", -31.3, 146.9),
      // coords near but not at the rounded centre -> no assertion
      ("r2", "New South Wales", "-31.2600", "146.9211", -31.26, 146.9211))
      .toDF("rowKey", "processed_stateProvince",
        "decimalLatitude", "decimalLongitude",
        "processed_decimalLatitude", "processed_decimalLongitude")
    val dim = Seq(("New South Wales", -31.2532183, 146.921099))
      .toDF("stateProvince", "centreLat", "centreLon")
    val out = DimensionStages.checkStateCentrePoints(df, dim)
    val byKey = out.select($"rowKey", $"assertions_statecentre")
      .as[(String, Seq[Int])].collect().toMap
    assert(byKey("r1") == Seq(22) && byKey("r2").isEmpty)
  }

  test("sensitivity rules: zone, date window, withholding, most-restrictive") {
    val df = Seq(
      // in-zone NSW record inside the outbreak window
      ("r1", "Phytophthora cinnamomi", "New South Wales",
        java.sql.Date.valueOf("2021-06-01"), -33.86001, 151.21001, Some(50.0)),
      // same name, Queensland: the NSW-zoned rule must not fire
      ("r2", "Phytophthora cinnamomi", "Queensland",
        java.sql.Date.valueOf("2021-06-01"), -27.47001, 153.02001, None),
      // same name, NSW but outside the date window
      ("r3", "Phytophthora cinnamomi", "New South Wales",
        java.sql.Date.valueOf("2023-01-01"), -33.86001, 151.21001, None),
      // two applicable rules -> the 10km one must win over the 1km one
      ("r4", "Calyptorhynchus lathami", "New South Wales",
        java.sql.Date.valueOf("2021-06-01"), -33.86001, 151.21001, None))
      .toDF("rowKey", "processed_scientificName", "processed_stateProvince",
        "processed_eventDate", "processed_decimalLatitude",
        "processed_decimalLongitude", "processed_coordinateUncertaintyInMeters")
      .withColumn("processed_day", lit(1))
    val dim = Seq(
      ("phytophthora cinnamomi", 1000, "New South Wales", "PBC2",
        "2021-01-01", "2021-12-31", true),
      ("calyptorhynchus lathami", 1000, null, "Conservation", null, null, false),
      ("calyptorhynchus lathami", 10000, "New South Wales", "Conservation",
        null, null, false))
      .toDF("nameLower", "generalisationMetres", "zone", "category",
        "fromDate", "toDate", "withholdEvent")
    val out = DimensionStages.processSensitivity(df, dim).cache()

    val r1 = out.filter($"rowKey" === "r1").select(
      "processed_decimalLatitude", "processed_coordinateUncertaintyInMeters",
      "processed_eventDate", "processed_informationWithheld",
      "originalSensitiveValues").head()
    assert(r1.getDouble(0) == -33.86)        // 1 km -> 2 dp
    assert(r1.getDouble(1) == 1050.0)        // 50 + 1000 rule radius
    assert(r1.isNullAt(2))                   // event date withheld
    assert(r1.getString(3) != null)
    val stash = r1.getMap[String, String](4)
    assert(stash("eventDate") == "2021-06-01" && stash("day") == "1")

    // zone and window misses leave coordinates untouched
    for (k <- Seq("r2", "r3")) {
      val r = out.filter($"rowKey" === k)
        .select("isSensitive", "processed_eventDate").head()
      assert(!r.getBoolean(0) && !r.isNullAt(1))
    }
    // most restrictive of two applicable rules: 10 km -> 1 dp
    val r4 = out.filter($"rowKey" === "r4").select(
      "processed_decimalLatitude", "processed_dataGeneralizations").head()
    assert(r4.getDouble(0) == -33.9)
    assert(r4.getString(1).contains("10000 metres"))
  }

  test("species groups containment join") {
    val df = Seq(("r1", 150), ("r2", 50), ("r3", 999))
      .toDF("rowKey", "processed_lft")
    val groups = Seq(("Mammals", 100, 200), ("Animals", 1, 500))
      .toDF("speciesGroup", "lft", "rgt")
    val out = DimensionStages.speciesGroups(df, groups)
      .select("rowKey", "processed_speciesGroups")
      .as[(String, Seq[String])].collect().toMap
    assert(out("r1").toSet == Set("Mammals", "Animals"))
    assert(out("r2").toSet == Set("Animals"))
    assert(out("r3").isEmpty)
  }

  test("validation rule adds query assertion to matching rows") {
    val df = Seq(("r1", 5), ("r2", 50)).toDF("rowKey", "qty")
      .withColumn("assertions", array().cast(
        "array<struct<name:string,code:int,qaStatus:int,comment:string>>"))
    val out = DimensionStages.applyValidationRule(df, col("qty") > 10,
      "bigQty", "quantity looks wrong")
    val counts = out.select($"rowKey", size($"assertions"))
      .as[(String, Int)].collect().toMap
    assert(counts == Map("r1" -> 0, "r2" -> 1))
  }

  test("dwca export writes a valid zip with meta/eml/occurrence") {
    val df = Seq(("dr1|r1", "Macropus rufus", "2012-03-05"))
      .toDF("rowKey", "scientificName", "eventDate")
    val out = java.nio.file.Files.createTempDirectory("dwca-out")
      .resolve("dr1.zip").toString
    DwcaExport.`export`(df, "dr1", "Test resource", out)
    val zf = new java.util.zip.ZipFile(out)
    val names = zf.entries().asIterator().asScala.map(_.getName).toSet
    assert(names == Set("meta.xml", "eml.xml", "occurrence.csv"))
    val csv = scala.io.Source.fromInputStream(
      zf.getInputStream(zf.getEntry("occurrence.csv"))).mkString
    assert(csv.contains("Macropus rufus"))
    val meta = scala.io.Source.fromInputStream(
      zf.getInputStream(zf.getEntry("meta.xml"))).mkString
    assert(meta.contains("scientificName") && meta.contains("<id index=\"0\"/>"))
    zf.close()
  }

  private implicit class IterAdapter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }
}
