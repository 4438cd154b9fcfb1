package graft.processors

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProcessorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def assertions(df: org.apache.spark.sql.DataFrame, rowKey: String): Set[Int] =
    df.filter(col("occurrenceID") === rowKey)
      .select(explode(col("assertionCodes"))).as[Int].collect().toSet

  lazy val raw = Seq(
    // occurrenceID, eventDate, year, month, day, lat, lon, vlat, vlon, unc, datum, bor, status, sciName
    ("r1", "2012-03-05", null, null, null, "-35.2", "149.1", null, null, "100", "WGS84", "PreservedSpecimen", "present", "Macropus rufus"),
    ("r2", null, "2010", "14", "2", "-35.2", "149.1", null, null, null, null, "specimen", null, "Unknownus speciesus"),
    ("r3", null, null, null, null, "149.1", "-35.2", null, null, "junk", "WGS84", null, "zzz", null),
    ("r4", "3000-01-01", null, null, null, "0", "0", null, null, "1km", "WGS84", "HumanObservation", "absent", "Macropus rufus"),
    ("r5", null, null, null, null, null, null, "30° 01' S", "153° 12' E", ">1km", "WGS84", "observation", "present", "Macropus rufus")
  ).toDF("occurrenceID", "eventDate", "year", "month", "day",
    "decimalLatitude", "decimalLongitude", "verbatimLatitude",
    "verbatimLongitude", "coordinateUncertaintyInMeters", "geodeticDatum",
    "basisOfRecord", "occurrenceStatus", "scientificName")

  lazy val namesDim = Seq(
    ("macropus rufus", "lsid:1", "Macropus rufus", "species", "Animalia",
      "Macropodidae", "Macropus", 100, 101)
  ).toDF("nameLower", "taxonConceptID", "acceptedName", "taxonRank",
    "kingdom", "family", "genus", "lft", "rgt")

  lazy val enriched = Processors.enrich(raw, Some(namesDim)).cache()

  test("clean record: processed fields set, no fatal assertions") {
    val r1 = enriched.filter($"occurrenceID" === "r1")
    val row = r1.select("processed_eventDate", "processed_year",
      "processed_basisOfRecord", "processed_taxonConceptID",
      "geospatiallyKosher").head()
    assert(row.getDate(0).toString == "2012-03-05")
    assert(row.getInt(1) == 2012)
    assert(row.getString(2) == "PreservedSpecimen")
    assert(row.getString(3) == "lsid:1")
    assert(row.getBoolean(4))
  }

  test("day/month transposed is repaired and flagged (30009)") {
    val r2 = enriched.filter($"occurrenceID" === "r2")
      .select("processed_month", "processed_day").head()
    assert(r2.getInt(0) == 2 && r2.getInt(1) == 14)
    assert(assertions(enriched, "r2").contains(30009))
  }

  test("vocab variant resolves; unknown name flagged (10004)") {
    val r2 = enriched.filter($"occurrenceID" === "r2")
      .select("processed_basisOfRecord").head()
    assert(r2.getString(0) == "PreservedSpecimen")
    assert(assertions(enriched, "r2").contains(10004))
  }

  test("inverted coordinates repaired and flagged (3)") {
    val r3 = enriched.filter($"occurrenceID" === "r3")
      .select("processed_decimalLatitude", "processed_decimalLongitude").head()
    assert(r3.getDouble(0) == -35.2 && r3.getDouble(1) == 149.1)
    val a = assertions(enriched, "r3")
    assert(a.contains(3))     // invertedCoordinates
    assert(a.contains(20001)) // missingBasisOfRecord
    assert(a.contains(20017)) // unrecognisedOccurrenceStatus
    assert(a.contains(24))    // uncertaintyRangeMismatch ("junk")
  }

  test("zero coordinates + future date are fatal to kosher (4, 30007)") {
    val a = assertions(enriched, "r4")
    assert(a.contains(4))
    assert(a.contains(30007))
    val kosher = enriched.filter($"occurrenceID" === "r4")
      .select("geospatiallyKosher").head().getBoolean(0)
    assert(!kosher)
  }

  test("verbatim DMS fallback computes coordinates and flags 47") {
    val r5 = enriched.filter($"occurrenceID" === "r5")
      .select("processed_decimalLatitude", "processed_decimalLongitude").head()
    assert(math.abs(r5.getDouble(0) - (-30.0166)) < 0.01)
    assert(math.abs(r5.getDouble(1) - 153.2) < 0.01)
    assert(assertions(enriched, "r5").contains(47))
  }

  test("uncertainty range parse: '>1km' -> 1000m") {
    val r5 = enriched.filter($"occurrenceID" === "r5")
      .select("processed_coordinateUncertaintyInMeters").head()
    assert(r5.getDouble(0) == 1000.0)
  }

  test("absent occurrenceStatus normalised") {
    val r4 = enriched.filter($"occurrenceID" === "r4")
      .select("processed_occurrenceStatus").head()
    assert(r4.getString(0) == "absent")
  }

  // ANSI-mode safety: Spark 4 default ANSI casts THROW on garbage; the
  // pipeline must instead null-and-assert (reference parsers tolerate
  // garbage by design). One malformed record must not crash the job.
  lazy val garbage = Seq(
    ("g1", null, "june", "first", "one", "not-a-lat", "not-a-lon", null),
    ("g2", "99999-13-45", "12345678901", null, null, "-35.2", "east-ish", null),
    ("g3", "1900-01-01", null, null, null, "-35.2", "149.1", "100")
  ).toDF("occurrenceID", "eventDate", "year", "month", "day",
    "decimalLatitude", "decimalLongitude", "coordinateUncertaintyInMeters")

  lazy val enrichedGarbage = Processors.enrich(garbage).cache()

  test("non-numeric year/month/day/lat/lon survive ANSI mode as nulls") {
    val g1 = enrichedGarbage.filter($"occurrenceID" === "g1")
      .select("processed_year", "processed_decimalLatitude").head()
    assert(g1.isNullAt(0) && g1.isNullAt(1))
    // lat unparseable + lon supplied-only → no decimal coordinates
    assert(assertions(enrichedGarbage, "g1").contains(44))
  }

  test("out-of-range date strings survive ANSI mode and flag 30007") {
    val g2 = enrichedGarbage.filter($"occurrenceID" === "g2")
      .select("processed_eventDate").head()
    assert(g2.isNullAt(0))
    assert(assertions(enrichedGarbage, "g2").contains(30007))
  }

  test("first-of-month and first-of-year and first-of-century all emitted on Jan 1 1900") {
    val a = assertions(enrichedGarbage, "g3")
    assert(a.contains(30003)) // firstOfMonth fires on every day==1
    assert(a.contains(30004)) // firstOfYear additionally on Jan 1
    assert(a.contains(30005)) // firstOfCentury additionally on year % 100 == 0
  }

  test("datum reprojection: AGD66/NZGD49 shift to WGS84; junk stays put (reference DatumTest)") {
    import graft.geo.Wkt.haversineMetres
    val df = Processors.enrich(Seq(
      ("agd66", "-27.5623432", "152.28342342", "AGD66"),
      ("agd8466", "-27.5623432", "152.28342342", "AGD84/66"),
      ("nzgd49", "-43.5321", "172.6362", "NZGD49"),
      ("nzgd1949", "-43.5321", "172.6362", "NZGD1949"),
      ("wgs", "-27.5623432", "152.28342342", "WGS84"),
      ("junk", "-27.5623432", "152.28342342", "sjdsakjdkjskaldj"),
      ("nodatum", "-27.5623432", "152.28342342", null))
      .toDF("occurrenceID", "decimalLatitude", "decimalLongitude",
        "geodeticDatum")).cache()
    def row(id: String) = df.filter($"occurrenceID" === id)
      .select("processed_decimalLatitude", "processed_decimalLongitude",
        "processed_geodeticDatum", "assertionCodes").head()
    for (id <- Seq("agd66", "agd8466", "nzgd49", "nzgd1949")) {
      val r = row(id)
      assert(r.getString(2) == "EPSG:4326", id)
      val srcLat = if (id.startsWith("agd")) -27.5623432 else -43.5321
      val srcLon = if (id.startsWith("agd")) 152.28342342 else 172.6362
      val d = haversineMetres(srcLon, srcLat, r.getDouble(1), r.getDouble(0))
      assert(d > 50 && d < 300, s"$id shifted ${d}m")
      assert(r.getSeq[Int](3).contains(45), id) // DECIMAL_LAT_LONG_CONVERTED
    }
    // AGD66 national shift in QLD is north-east: GDA94 coords are larger
    val a = row("agd66")
    assert(a.getDouble(0) > -27.5623432 && a.getDouble(1) > 152.28342342)
    val w = row("wgs")
    assert(w.getDouble(0) == -27.5623432 && w.getString(2) == "EPSG:4326")
    assert(!w.getSeq[Int](3).contains(45))
    val j = row("junk")
    assert(j.isNullAt(2) && j.getDouble(0) == -27.5623432)
    assert(j.getSeq[Int](3).contains(52)) // UNRECOGNIZED_GEODETIC_DATUM
    val n = row("nodatum")
    assert(n.getSeq[Int](3).contains(51)) // GEODETIC_DATUM_ASSUMED_WGS84
    // reference validateGeoreferenceValues: the assumed WGS84 label counts
    // as a processed datum, so MISSING_GEODETICDATUM passes
    assert(!n.getSeq[Int](3).contains(30))
  }

  test("altitude/depth: feet conversion, range checks, min/max repair") {
    import graft.processors.Processors
    val df = Processors.processAltitudeAndDepth(Seq(
      ("a", "100 ft", null, null, null, null, null),
      ("b", "15000", "200", null, null, null, null),
      ("c", "unclear", "11km", null, null, null, null),
      ("d", null, null, "50", "10", "900", "100"))
      .toDF("occurrenceID", "verbatimElevation", "verbatimDepth",
        "minimumDepthInMeters", "maximumDepthInMeters",
        "minimumElevationInMeters", "maximumElevationInMeters")).cache()
    def codes(id: String) = df.filter($"occurrenceID" === id)
      .select("assertions_altdepth").head().getSeq[Int](0).toSet
    val a = df.filter($"occurrenceID" === "a")
      .select("processed_verbatimElevation").head().getDouble(0)
    assert(math.abs(a - 30.48) < 0.01)
    assert(codes("a") == Set(13)) // ALTITUDE_IN_FEET
    assert(codes("b") == Set(7))  // ALTITUDE_OUT_OF_RANGE (15000 > 10000)
    assert(codes("c") == Set(14, 11)) // non-numeric elev + 11km depth range
    assert(codes("d") == Set(12, 9))  // both min/max pairs reversed
    val d = df.filter($"occurrenceID" === "d")
      .select("processed_minimumDepthInMeters", "processed_maximumDepthInMeters",
        "processed_minimumElevationInMeters", "processed_maximumElevationInMeters")
      .head()
    assert(d.getDouble(0) == 10.0 && d.getDouble(1) == 50.0)
    assert(d.getDouble(2) == 100.0 && d.getDouble(3) == 900.0)
  }

  test("e2e garbage survives sampling, outliers and index build (ANSI-safe)") {
    import graft.operators.{Outliers, Sampling}
    // raw strings incl. "east-ish" / "not-a-lat" flow through every operator
    // that types coordinates; none may ANSI-crash, garbage rows just drop out
    val pts = Sampling.distinctCoordinates(garbage).collect()
    assert(pts.length == 1) // only g3 has parseable coords

    val layers = Seq(("cl22", "NSW",
      "POLYGON((148 -37, 151 -37, 151 -33, 148 -33, 148 -37))"))
      .toDF("layerId", "value", "wkt")
    val samples = Sampling.samplePoints(spark,
      Sampling.distinctCoordinates(garbage), layers)
    val back = Sampling.loadSamplesIntoRecords(garbage, samples)
    assert(back.count() == 3) // all rows survive, keys null on garbage

    val dists = Seq(("t1",
      "POLYGON((150 -36, 151 -36, 151 -35, 150 -35, 150 -36))"))
      .toDF("taxonGuid", "wkt")
    val recs = garbage.withColumn("taxonGuid", lit("t1"))
    // g3 (-35.2, 149.1) is outside the polygon -> appears; g1/g2 dropped
    val out = Outliers.expertDistributionOutliers(spark, recs, dists,
      thresholdMetres = 1000)
    assert(out.select("occurrenceID").collect().map(_.getString(0)).toSeq
      == Seq("g3"))

    val enrichedIdx = graft.index.IndexSupport.project(
      enrichedGarbage.withColumn("rowKey", col("occurrenceID")))
    assert(enrichedIdx.count() == 3)
    val g3 = enrichedIdx.filter(col("id") === "g3")
      .select("point01", "latitude").head()
    assert(g3.getString(0) == "-35.2,149.1")
  }
}
