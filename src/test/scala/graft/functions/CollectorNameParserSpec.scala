package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Cases carried from the reference CollectorParserTest (feasible subset). */
class CollectorNameParserSpec extends AnyFunSuite {
  import CollectorNameParser._

  test("Surname, initials stays canonical") {
    assert(parse("Beauglehole, A.C.").contains("Beauglehole, A.C."))
  }

  test("Surname, firstname gains derived initial") {
    assert(parse("Beauglehole, Atest").contains("Beauglehole, A. Atest"))
  }

  test("Surname, firstname + initials reorders") {
    assert(parse("Field, Ross P.").contains("Field, P. Ross"))
  }

  test("firstname-first reorders to canonical") {
    assert(parse("Simon Starr").contains("Starr, S. Simon"))
    assert(parse("Simon S.S Starr").contains("Starr, S.S. Simon"))
  }

  test("initials then surname") {
    assert(parse("NL Kirby").contains("Kirby, N.L."))
  }

  test("emails pass through") {
    assert(parse("natasha.carter@csiro.au").contains("natasha.carter@csiro.au"))
  }

  test("glued initials + surname") {
    assert(parse("A.G.Gunness et. al.").contains("Gunness, A.G."))
  }

  test("titles are dropped") {
    assert(parse("Dittrich, Lieutenant").contains("Dittrich"))
    assert(parseForList("Annabell, Mr. Graeme R").isDefined)
  }

  test("surname prefixes survive") {
    assert(parse("van Leeuwen, S.").contains("van Leeuwen, S."))
    assert(parse("van der Leeuwen, Simon").contains("van der Leeuwen, S. Simon"))
    assert(parse("Blandowski, J.W.T.L. von").contains("von Blandowski, J.W.T.L."))
  }

  test("brackets ignored") {
    assert(parse("David Ratkowsky (2589)").contains("Ratkowsky, D. David"))
    assert(parseForList("\"KINNEAR A.J. (Sandy)\"").contains(List("Kinnear, A.J.")))
  }

  test("hyphenated names") {
    assert(parse("Russell-Smith, J.").contains("Russell-Smith, J."))
    assert(parseForList("\"DAVIES R.J-P. Richard\"")
      .contains(List("Davies, R.J-P. Richard")))
  }

  test("quoted multi-collector strings split") {
    assert(parseForList("\"KENNY S.D. Sue\"\"WALLACE-WARD D. Di\"")
      .contains(List("Kenny, S.D. Sue", "Wallace-Ward, D. Di")))
  }

  test("empty and null") {
    assert(parse(null).isEmpty)
    assert(parse("  ").isEmpty)
    assert(parseForList("").isEmpty)
  }
}
