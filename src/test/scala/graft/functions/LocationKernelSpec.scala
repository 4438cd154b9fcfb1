package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.model.AssertionCodes._

/** Behavioural parity with the reference LocationProcessor coordinate path,
  * case-for-case from `ProcessLocationTest.scala` in
  * /root/reference/src/test/scala/au/org/ala/biocache/. */
class LocationKernelSpec extends AnyFunSuite {

  private def run(lat: String = null, lon: String = null, datum: String = null,
      vlat: String = null, vlon: String = null, vsrs: String = null,
      easting: String = null, northing: String = null, zone: String = null,
      grid: String = null, unc: String = null, prec: String = null,
      country: String = null): LocationResult =
    LocationKernel.process(lat, lon, datum, vlat, vlon, vsrs, easting,
      northing, zone, grid, unc, prec, country)

  private def has(r: LocationResult, code: graft.model.ErrorCode): Boolean =
    r.codes.contains(code.code)

  test("country code resolves through the vocab (ProcessLocationTest:21)") {
    assert(graft.vocab.Countries.matchTerm("GB").contains("United Kingdom"))
    assert(graft.vocab.Countries.matchTerm("dummy").isEmpty)
  }

  test("uncertainty mistakenly in precision (ProcessLocationTest:105)") {
    val r = run(lat = "-35.21667", lon = "144.81060", prec = "100.66")
    assert(has(r, UNCERTAINTY_IN_PRECISION))
    assert(r.uncertainty == 100.0)
  }

  test("uncertainty with unit (ProcessLocationTest:120)") {
    val r = run(lat = "-35.21667", lon = "144.81060", unc = "100 meters")
    assert(!has(r, UNCERTAINTY_RANGE_MISMATCH))
    assert(r.uncertainty == 100.0)
  }

  test("coordinates out of range (ProcessLocationTest:135)") {
    assert(has(run(lat = "91", lon = "121", unc = "1000"), COORDINATES_OUT_OF_RANGE))
    assert(has(run(lat = "-32", lon = "190"), COORDINATES_OUT_OF_RANGE))
    assert(!has(run(lat = "-32", lon = "120"), COORDINATES_OUT_OF_RANGE))
    assert(has(run(lat = "-120", lon = "120"), COORDINATES_OUT_OF_RANGE))
    assert(has(run(lat = "-32", lon = "-200"), COORDINATES_OUT_OF_RANGE))
  }

  test("inverted coordinates repaired (ProcessLocationTest:176)") {
    val r = run(lat = "123.123", lon = "-34.29")
    assert(has(r, INVERTED_COORDINATES))
    assert(r.lat == -34.29 && r.lon == 123.123)
  }

  test("zero latitude (ProcessLocationTest:194)") {
    val r = run(lat = "0", lon = "149.099", unc = "100", country = "Australia")
    assert(has(r, ZERO_LATITUDE_COORDINATES))
  }

  test("zero longitude (ProcessLocationTest:210)") {
    val r = run(lat = "-34.222", lon = "0", unc = "100", country = "Australia")
    assert(has(r, ZERO_LONGITUDE_COORDINATES))
  }

  test("negated latitude repaired via country bbox (ProcessLocationTest:226)") {
    val r = run(lat = "35.23", lon = "149.099", unc = "100", country = "Australia")
    assert(has(r, NEGATED_LATITUDE))
    assert(r.lat == -35.23)
    assert(!has(r, COUNTRY_COORDINATE_MISMATCH))
  }

  test("negated longitude repaired via country bbox (ProcessLocationTest:245)") {
    val r = run(lat = "-35.23", lon = "-149.099", unc = "100", country = "Australia")
    assert(has(r, NEGATED_LONGITUDE))
    assert(r.lon == 149.099)
    assert(!has(r, COUNTRY_COORDINATE_MISMATCH))
  }

  test("0,0 nulls the coordinates (ProcessLocationTest:307)") {
    val r = run(lat = "0.0", lon = "0.0", unc = "100")
    assert(has(r, ZERO_COORDINATES))
    assert(r.lat == null && r.lon == null)
  }

  test("country coordinate mismatch (ProcessLocationTest:405)") {
    // NSW point declared as Norfolk Island — no negation rescues it
    val r = run(lat = "-31.2532183", lon = "146.921099", country = "Norfolk Island")
    assert(has(r, COUNTRY_COORDINATE_MISMATCH))
    val ok = run(lat = "-29.04", lon = "167.95", country = "Norfolk Island")
    assert(!has(ok, COUNTRY_COORDINATE_MISMATCH))
  }

  test("uncertainty range mismatch (ProcessLocationTest:425)") {
    val r = run(lat = "-31.2532183", lon = "146.921099", unc = "-1")
    assert(has(r, UNCERTAINTY_RANGE_MISMATCH))
  }

  test("uncertainty not specified (ProcessLocationTest:437)") {
    val r = run(lat = "-31.2532183", lon = "146.921099")
    assert(has(r, UNCERTAINTY_NOT_SPECIFIED))
  }

  test("easting/northing/zone, GDA94 assumed (ProcessLocationTest:546)") {
    val r = run(easting = "539514.0", northing = "5362674.0", zone = "55")
    assert(has(r, DECIMAL_LAT_LONG_CALCULATED_FROM_EASTING_NORTHING))
    assert(!has(r, INVERTED_COORDINATES))
    assert(math.abs(r.lat - -41.88688) < 2e-5, r.lat)
    assert(math.abs(r.lon - 147.47628) < 2e-5, r.lon)
  }

  test("verbatim DMS, WGS84 assumed (ProcessLocationTest:579)") {
    val r = run(vlat = "22° 2' 56\" N", vlon = "92° 25' 11\" E")
    assert(has(r, DECIMAL_LAT_LONG_CALCULATED_FROM_VERBATIM))
    assert(r.datum == "EPSG:4326")
    assert(math.abs(r.lat - 22.04889) < 1e-4, r.lat)
    assert(math.abs(r.lon - 92.41972) < 1e-4, r.lon)
  }

  test("AGD66 decimal reprojection (ProcessLocationTest:605)") {
    val r = run(lat = "-35.126", lon = "150.681", datum = "EPSG:4202")
    assert(has(r, DECIMAL_LAT_LONG_CONVERTED))
    assert(r.datum == "EPSG:4326")
    assert(r.lat == -35.125 && r.lon == 150.682)
    assert(!has(r, INVERTED_COORDINATES))
  }

  test("verbatim with SRS reprojection (ProcessLocationTest:639)") {
    val r = run(vlat = "-35.126", vlon = "150.681", vsrs = "EPSG:4202")
    assert(has(r, DECIMAL_LAT_LONG_CALCULATED_FROM_VERBATIM))
    assert(r.datum == "EPSG:4326")
    assert(r.lat == -35.125 && r.lon == 150.682)
  }

  test("WGS84 assumed keeps full precision (ProcessLocationTest:673)") {
    val r = run(lat = "-34.9666709899902", lon = "138.733337402344")
    assert(has(r, GEODETIC_DATUM_ASSUMED_WGS84))
    assert(r.datum == "EPSG:4326")
    assert(r.lat == -34.9666709899902)
    assert(r.lon == 138.733337402344)
  }

  test("DMS then AGD66 reprojection (ProcessLocationTest:697)") {
    val r = run(vlat = "43°22'06\" S", vlon = "145°47'11\" E", vsrs = "EPSG:4202")
    assert(has(r, DECIMAL_LAT_LONG_CALCULATED_FROM_VERBATIM))
    assert(r.datum == "EPSG:4326")
    // ~25 m slack: the reference's GeoTools transform and the published
    // national 7-parameter Helmert differ by ~20 m in Tasmania (the
    // mainland case above matches exactly at 3 dp)
    assert(math.abs(r.lat - -43.36697) < 3e-4, r.lat)
    assert(math.abs(r.lon - 145.78746) < 3e-4, r.lon)
  }

  test("AGD66 recognised by name (ProcessLocationTest:722)") {
    val r = run(lat = "-35.126", lon = "150.681", datum = "AGD66")
    assert(r.lat == -35.125 && r.lon == 150.682)
    assert(r.datum == "EPSG:4326")
    assert(has(r, DECIMAL_LAT_LONG_CONVERTED))
  }

  test("bad geodeticDatum keeps coordinates, null label (ProcessLocationTest:772)") {
    val r = run(lat = "-35.126", lon = "150.681", datum = "FOO")
    assert(r.lat == -35.126 && r.lon == 150.681)
    assert(r.datum == null)
    assert(has(r, UNRECOGNIZED_GEODETIC_DATUM))
  }

  test("bad verbatimSRS drops the point (ProcessLocationTest:798)") {
    val r = run(vlat = "-35.126", vlon = "150.681", vsrs = "FOO")
    assert(r.lat == null && r.lon == null && r.datum == null)
    assert(has(r, DECIMAL_LAT_LONG_CALCULATION_FROM_VERBATIM_FAILED))
  }

  test("decimal coordinates not supplied (ProcessLocationTest:824)") {
    assert(has(run(vlat = "-35.126", vlon = "150.681"),
      DECIMAL_COORDINATES_NOT_SUPPLIED))
    assert(!has(run(lat = "-35.126", lon = "150.681", vlat = "-35.126",
      vlon = "150.681"), DECIMAL_COORDINATES_NOT_SUPPLIED))
  }

  test("precision range mismatch (ProcessLocationTest:841)") {
    assert(has(run(vlat = "-35.126", vlon = "150.681", prec = "test"),
      PRECISION_RANGE_MISMATCH))
    // >1 is rescued as uncertainty, so no range mismatch
    assert(!has(run(vlat = "-35.126", vlon = "150.681", prec = "700"),
      PRECISION_RANGE_MISMATCH))
    assert(has(run(vlat = "-35.126", vlon = "150.681", prec = "0"),
      PRECISION_RANGE_MISMATCH))
    assert(!has(run(vlat = "-35.126", vlon = "150.681", prec = "0.01"),
      PRECISION_RANGE_MISMATCH))
  }

  test("coordinate precision mismatch (ProcessLocationTest:869)") {
    assert(!has(run(vlat = "-35.126", vlon = "150.681", prec = "0.001"),
      COORDINATE_PRECISION_MISMATCH))
    assert(has(run(vlat = "-35.126", vlon = "150.68", prec = "0.001"),
      COORDINATE_PRECISION_MISMATCH))
    assert(has(run(vlat = "-35.1", vlon = "150.68", prec = "0.001"),
      COORDINATE_PRECISION_MISMATCH))
  }

  test("verbatim datum does not override supplied decimals (ProcessLocationTest:936)") {
    val r = run(lat = "-43.36697", lon = "145.78746", datum = "WGS84",
      vlat = "43°22'06\" S", vlon = "145°47'11\" E", vsrs = "EPSG:4202")
    assert(r.datum == "EPSG:4326")
    assert(r.lat == -43.36697 && r.lon == 145.78746)
  }
}
