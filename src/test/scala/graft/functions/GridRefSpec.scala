package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Expectations carried from the reference GridReferenceTest. */
class GridRefSpec extends AnyFunSuite {

  test("NM39 -> easting/northing/cell per reference") {
    assert(GridRef.parseOsgb("NM39").contains((130000, 790000, 10000)))
  }

  test("NM399799 6-figure") {
    assert(GridRef.parseOsgb("NM399799").contains((139900, 779900, 100)))
  }

  test("tetrad suffixes per reference table") {
    assert(GridRef.parseOsgb("NM39A").contains((130000, 790000, 2000)))
    assert(GridRef.parseOsgb("NM39E").contains((130000, 798000, 2000)))
    assert(GridRef.parseOsgb("NM39G").contains((132000, 792000, 2000)))
    assert(GridRef.parseOsgb("NM39S").contains((136000, 794000, 2000)))
    assert(GridRef.parseOsgb("NM39N").contains((134000, 796000, 2000)))
    assert(GridRef.parseOsgb("NM39P").contains((134000, 798000, 2000)))
    assert(GridRef.parseOsgb("NM39Z").contains((138000, 798000, 2000)))
  }

  test("NM39 WGS84 cell centre matches reference (56.97001, -6.36199)") {
    val g = GridRef.parse("NM39").get
    assert(math.abs(g.lat - 56.97001) < 0.001, s"lat=${g.lat}")
    assert(math.abs(g.lon - (-6.36199)) < 0.001, s"lon=${g.lon}")
    assert(g.datum == "OSGB36")
    assert(g.gridSizeMetres == 10000)
  }

  test("Irish H99 per reference (E 290000, N 390000)") {
    assert(GridRef.parseIrish("H99").contains((290000, 390000, 10000)))
  }

  test("Irish J4967 and IJ4967 equivalent, near reference lat/lon") {
    val a = GridRef.parse("J4967").get
    val b = GridRef.parse("IJ4967").get
    assert(a.easting == b.easting && a.northing == b.northing)
    // reference reports bottom-left (54.52944, -5.69914); centre is ~½ cell NE
    assert(math.abs(a.lat - 54.52944) < 0.01, s"lat=${a.lat}")
    assert(math.abs(a.lon - (-5.69914)) < 0.02, s"lon=${a.lon}")
  }

  test("garbage is rejected") {
    assert(GridRef.parse("hello world").isEmpty)
    assert(GridRef.parse("").isEmpty)
    assert(GridRef.parse(null).isEmpty)
    assert(GridRef.parseOsgb("IA39").isEmpty) // I invalid in OSGB
  }
}
