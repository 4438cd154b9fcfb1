package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Column-header guessing, case-for-case from the reference
  * `AdhocParsingTest.scala` in /root/reference/src/test, plus extractor
  * spot checks. */
class AdHocParserSpec extends AnyFunSuite {

  test("unknown values still yield one header per column (AdhocParsingTest:10)") {
    assert(AdHocParser.guessColumnHeaders(Seq("dsads", "sdas")).size == 2)
  }

  test("two verbatim coordinates (AdhocParsingTest:22)") {
    val headers = AdHocParser.guessColumnHeaders(
      Seq("-37º 3' 48'' S", "149º 54' 14'' E"))
    assert(headers.length == 2)
    assert(headers(0) == "verbatimLatitude")
    assert(headers(1) == "verbatimLongitude")
  }

  test("sequential duplicated latitudes repair to a lat/lon pair") {
    assert(AdHocParser.guessColumnHeaders(Seq("-35.2", "49.1")) ==
      Seq("decimalLatitude", "decimalLongitude"))
  }

  test("extractor spot checks") {
    assert(AdHocParser.guessType("PreservedSpecimen") == "basisOfRecord")
    assert(AdHocParser.guessType("2012-03-05") == "eventDate")
    assert(AdHocParser.guessType("holotype") == "typeStatus")
    assert(AdHocParser.guessType("Australia") == "country")
    assert(AdHocParser.guessType("New South Wales") == "stateProvince")
    assert(AdHocParser.guessType("urn:lsid:biodiversity.org.au:123") == "occurrenceID")
    assert(AdHocParser.guessType("WGS84") == "geodeticDatum")
    assert(AdHocParser.guessType("http://a.org/im/g1.jpg") == "associatedMedia")
    assert(AdHocParser.guessType("ABC-1234") == "catalogNumber")
    assert(AdHocParser.guessType("149.5") == "decimalLongitude")
    assert(AdHocParser.guessType("200.5") == "") // out of any coordinate range
    assert(AdHocParser.guessType("") == "")
  }
}
