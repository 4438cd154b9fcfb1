package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** DMS / distance / collector parser cases (behavioural parity with the
  * reference VerbatimLatLongParser + DistanceRangeParser test suites). */
class ParsersSpec extends AnyFunSuite {
  import CoordinateParsers._

  test("DMS: 30° 01' S") {
    val v = parseVerbatimLatLong("30° 01' S").get
    assert(math.abs(v - (-30.016666)) < 0.001)
  }

  test("DMS: 153° 12' E") {
    val v = parseVerbatimLatLong("153° 12' E").get
    assert(math.abs(v - 153.2) < 0.001)
  }

  test("DMS with seconds: 145° 44' 55.85\" E") {
    val v = parseVerbatimLatLong("145° 44' 55.85\" E").get
    assert(math.abs(v - 145.74884) < 0.001)
  }

  test("DMS: 16° 52' 37\" S") {
    val v = parseVerbatimLatLong("16° 52' 37\" S").get
    assert(math.abs(v - (-16.876945)) < 0.001)
  }

  test("DMS garbage -> None") {
    assert(parseVerbatimLatLong("hello").isEmpty)
    assert(parseVerbatimLatLong(null).isEmpty)
  }

  test("distance: plain numbers") {
    assert(parseDistanceMetres("1.2222").get == 1.2222f)
    assert(parseDistanceMetres("444").get == 444f)
  }

  test("distance: ranges take upper bound") {
    assert(parseDistanceMetres("1-12km").get == 12000f)
    assert(parseDistanceMetres("1-10m").get == 10f)
    assert(parseDistanceMetres("1m-10m").get == 10f)
    assert(parseDistanceMetres("1km-10km").get == 10000f)
    assert(parseDistanceMetres("1km- 10.5km").get == 10500f)
    assert(parseDistanceMetres("10.2 - 11.5km").get == 11500f)
  }

  test("distance: greater/less-than") {
    assert(parseDistanceMetres("> 10km").get == 10000f)
    assert(parseDistanceMetres("< 10km").get == 10000f)
    assert(parseDistanceMetres(">11.5km").get == 11500f)
  }

  test("distance: unit words and feet") {
    assert(parseDistanceMetres("1000 meters").get == 1000f)
    assert(parseDistanceMetres("10 kilometers").get == 10000f)
    assert(math.abs(parseDistanceMetres("300 ft").get - 91.44f) < 0.01)
  }

  test("collector normalisation") {
    assert(normalizeCollector("Smith, J.") == "j smith")
    assert(normalizeCollector("J Smith") == "j smith")
    assert(normalizeCollector("  ") == null)
    assert(normalizeCollector(null) == null)
  }
}
