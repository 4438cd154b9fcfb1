package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class SpatialIndexSpec extends AnyFunSuite {

  private def rect(id: String, v: String, x0: Double, y0: Double,
      x1: Double, y1: Double): (String, String, Seq[Wkt.Ring]) =
    (id, v, Wkt.parsePolygons(
      s"POLYGON(($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))"))

  test("grid index agrees with the plain linear scan on a random field") {
    val rnd = new scala.util.Random(42)
    // 200 small rectangles + one hemisphere-wide polygon (broad path)
    val entries: Array[(String, String, Seq[Wkt.Ring])] =
      (0 until 200).map { i =>
        val x = rnd.nextDouble() * 340 - 170
        val y = rnd.nextDouble() * 160 - 80
        rect(s"cl$i", s"v$i", x, y, x + rnd.nextDouble() * 5,
          y + rnd.nextDouble() * 5)
      }.toArray :+ rect("clBroad", "west", -180, -90, 0, 90)
    val idx = SpatialIndex.build(entries, cellSizeDeg = 1.0,
      maxCellsPerEntry = 100)
    (0 until 500).foreach { _ =>
      val lon = rnd.nextDouble() * 360 - 180
      val lat = rnd.nextDouble() * 180 - 90
      val linear = entries.collect {
        case (id, v, rings) if Wkt.contains(lon, lat, rings) => id -> v
      }.toMap
      assert(idx.sample(lon, lat) == linear, s"($lon, $lat)")
    }
  }

  test("query preserves entry order so duplicate layerIds last-win like the scan") {
    val entries = Array(
      rect("cl1", "first", 0, 0, 10, 10),
      rect("cl1", "second", 5, 5, 15, 15))
    val idx = SpatialIndex.build(entries)
    assert(idx.sample(7, 7) == Map("cl1" -> "second"))
    assert(idx.sample(2, 2) == Map("cl1" -> "first"))
  }

  test("cell lookup prunes: polygons far from the point are not candidates") {
    // 10k disjoint 0.5-degree rectangles; a query must not ray-cast them all
    val entries = (0 until 10000).map { i =>
      val x = (i % 100) * 3.0 - 150
      val y = (i / 100) * 1.5 - 75
      rect(s"cl$i", s"v$i", x, y, x + 0.5, y + 0.5)
    }.toArray
    val idx = SpatialIndex.build(entries)
    val t0 = System.nanoTime()
    var i = 0
    while (i < 100000) {
      idx.sample(i % 300 - 150.0 + 0.25, i % 140 - 70.0 + 0.25)
      i += 1
    }
    val perQueryMicros = (System.nanoTime() - t0) / 1e3 / 100000
    // linear scan of 10k polygons would be ~100x slower than this bound
    assert(perQueryMicros < 50, s"query took ${perQueryMicros}µs")
  }
}
