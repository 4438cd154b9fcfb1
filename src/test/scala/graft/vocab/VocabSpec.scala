package graft.vocab

import org.scalatest.funsuite.AnyFunSuite

/** Vocabulary matching against the reference's own test expectations
  * (reference `VocabTest.scala` + `DatumTest.scala` in
  * /root/reference/src/test/scala/au/org/ala/biocache/). */
class VocabSpec extends AnyFunSuite {

  test("basis of record matching (reference VocabTest cases)") {
    assert(BasisOfRecord.matchTerm("PRESERVED_SPECIMEN").contains("PreservedSpecimen"))
    assert(BasisOfRecord.matchTerm("S").contains("PreservedSpecimen"))
    assert(BasisOfRecord.matchTerm("Observation").isDefined)
    assert(BasisOfRecord.matchTerm("DigitisedTrack").contains("Sound"))
    assert(BasisOfRecord.matchTerm("specimen").contains("PreservedSpecimen"))
  }

  test("type status matching incl. junk chars and plurals") {
    assert(TypeStatus.matchTerm("isotype").contains("isotype"))
    assert(TypeStatus.matchTerm("Syntype ?").contains("syntype"))
    assert(TypeStatus.matchTerm("Paratype").isDefined)
    // plural resolves via stemming (the reference's own expectation)
    assert(TypeStatus.matchTerm("Paratypes").contains("paratype"))
  }

  test("country matching") {
    assert(Countries.matchTerm("Mongolia").map(_.toLowerCase).contains("mongolia"))
    assert(Countries.matchTerm("United Kingdom").map(_.toLowerCase).contains("united kingdom"))
    assert(Countries.matchTerm("AU").map(_.toLowerCase).contains("australia"))
    assert(Countries.matchTerm("AUS").map(_.toLowerCase).contains("australia"))
  }

  test("state province matching + state-to-country") {
    assert(StateProvinces.matchTerm("NSW").contains("New South Wales"))
    assert(StateProvinces.matchTerm("qld").contains("Queensland"))
    assert(StateProvinceToCountry.map.get("New South Wales").contains("Australia"))
    assert(StateProvinceToCountry.countryFor("nsw").contains("Australia"))
  }

  test("establishmentMeans exact canonical") {
    assert(EstablishmentMeans.matchTerm("formerly cultivated (extinct)")
      .contains("formerly cultivated (extinct)"))
  }

  test("habitat compatibility map (reference HabitatMap cases)") {
    assert(Habitat.isCompatible("non-marine", "terrestrial").contains(true))
    assert(Habitat.isCompatible("marine", "terrestrial").contains(false))
    assert(Habitat.isCompatible("marine", "marine and non-marine").contains(true))
    assert(Habitat.isCompatible("non-marine", "marine and non-marine").contains(true))
    assert(Habitat.isCompatible("terrestrial", "marine and non-marine").contains(true))
    assert(Habitat.isCompatible("limnetic", "marine and non-marine").contains(true))
  }

  test("licence regex matching (reference VocabTest cases)") {
    assert(License.matchRegex("CC-BY 3.0 Au").contains("CC-BY 3.0 (Au)"))
    assert(License.matchRegex("CreativeCommons By 3.0 Au").contains("CC-BY 3.0 (Au)"))
    assert(License.matchRegex("CC-BY Au").contains("CC-BY 4.0 (Au)"))
    assert(License.matchRegex("CC-BY 3.0").contains("CC-BY 3.0 (Int)"))
    assert(License.matchRegex("CC-BY").contains("CC-BY 4.0 (Int)"))
    assert(License.matchRegex("CC-BY/SA 2.5 (Au)").contains("CC-BY-SA 2.5 (Au)"))
    assert(License.matchRegex("CC:BY:SA 3.0").contains("CC-BY-SA 3.0 (Int)"))
    assert(License.matchRegex("CC.BY.SA").contains("CC-BY-SA 4.0 (Int)"))
    assert(License.matchRegex("CC-BY-NC").contains("CC-BY-NC 4.0 (Int)"))
    assert(License.matchRegex("CC-BY-ND").contains("CC-BY-ND 4.0 (Int)"))
    assert(License.matchRegex("CC-BY-NC-SA-3.0-AU").contains("CC-BY-NC-SA 3.0 (Au)"))
    assert(License.matchRegex("Rotate widdershins").contains("Custom"))
  }

  test("mime types") {
    assert(MimeType.matchTerm("image/jpeg").contains("image/jpeg"))
    assert(MimeType.matchTerm("JPEG").contains("image/jpeg"))
    assert(MimeType.matchTerm("png").contains("image/png"))
  }

  test("datum matching incl. split forms and junk (reference DatumTest)") {
    assert(GeodeticDatum.matchTerm("WGS84").isDefined)
    assert(GeodeticDatum.epsg("WGS84").contains("EPSG:4326"))
    assert(GeodeticDatum.epsg("AGD66").contains("EPSG:4202"))
    assert(GeodeticDatum.epsg("AGD84/66").isDefined) // split on "/"
    assert(GeodeticDatum.matchTerm("NAD83").isDefined)
    assert(GeodeticDatum.matchTerm("NZGD49").isDefined)
    assert(GeodeticDatum.matchTerm("NZGD1949").isDefined)
    assert(GeodeticDatum.matchTerm("sjdsakjdkjskaldj").isEmpty)
  }

  test("raw datum extract: >= 5691 of 6510 strings recognised (reference bar)") {
    val in = getClass.getResourceAsStream("/testDatums.txt")
    val tests = scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString.split("\r\n|\r|\n").toSeq
    val matches = tests.count(t => GeodeticDatum.matchTerm(t).isDefined)
    assert(matches >= 5691, s"only $matches datum strings matched")
  }

  test("country centre points (reference VocabTest cases)") {
    assert(!CountryCentrePoints.coordinatesMatchCentre("Australia", "12", "12"))
    assert(!CountryCentrePoints.coordinatesMatchCentre("   ", "12", "12"))
    assert(CountryCentrePoints.coordinatesMatchCentre("Australia", "-29.5328037", "145.491477"))
    assert(CountryCentrePoints.coordinatesMatchCentre("Australia", "-29.53280", "145.4914"))
    assert(CountryCentrePoints.coordinatesMatchCentre("Australia", "-29.532", "145.491"))
    assert(CountryCentrePoints.getHemispheres("Australia").contains(Set('S', 'E', 'W')))
    assert(CountryCentrePoints.getHemispheres("United Kingdom").contains(Set('N', 'E', 'W')))
  }

  test("state centre points (reference VocabTest cases)") {
    assert(!StateProvinceCentrePoints.coordinatesMatchCentre("QLD", "12", "12"))
    assert(StateProvinceCentrePoints.coordinatesMatchCentre("QLD", "-20.9175738", "142.7027956"))
    assert(StateProvinceCentrePoints.coordinatesMatchCentre("QLD", "-20.917573", "142.702795"))
    assert(StateProvinceCentrePoints.coordinatesMatchCentre("QLD", "-20.917", "142.702"))
    assert(!StateProvinceCentrePoints.coordinatesMatchCentre("Unknown1", "-54.50285462", "158.9173835"))
  }

  test("porter stemmer basics") {
    assert(Stemmer.stem("caresses") == "caress")
    assert(Stemmer.stem("ponies") == "poni")
    assert(Stemmer.stem("relational") == "relat")
    assert(Stemmer.stem("observations") == Stemmer.stem("observation"))
    assert(Stemmer.stem("paratypes") == Stemmer.stem("paratype"))
  }
}
