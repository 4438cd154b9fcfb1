package graft.geo

/** Broadcastable grid index over polygons — replaces the per-point linear
  * scan of every layer polygon with an O(candidates-per-cell) lookup.
  *
  * The reference caches layer geometries in an in-process STRtree
  * (`caches/SpatialLayerDAO.scala:120-210` in
  * /root/reference/src/main/scala/au/org/ala/biocache/); a fixed-degree
  * grid gives the same candidate pruning with a serialisation-friendly
  * flat structure (one Map + arrays — broadcast once, shared by every
  * executor thread). Query cost is flat in the layer count: only polygons
  * whose bounding box intersects the point's cell are ray-cast.
  *
  * Polygons whose bbox spans more than `maxCellsPerEntry` cells (e.g. a
  * whole-hemisphere country) are kept in a small always-checked list
  * instead of being exploded into tens of thousands of cell entries.
  */
final class SpatialIndex private (
    val entries: Array[(String, String, Seq[Wkt.Ring])],
    cellSizeDeg: Double,
    cells: Map[Long, Array[Int]],
    broad: Array[Int],
    bboxes: Array[(Double, Double, Double, Double)]) extends Serializable {

  private def cellOf(v: Double): Int = math.floor(v / cellSizeDeg).toInt
  private def key(ix: Int, iy: Int): Long = (ix.toLong << 32) | (iy & 0xffffffffL)

  private def hit(i: Int, lon: Double, lat: Double): Boolean = {
    val (minX, minY, maxX, maxY) = bboxes(i)
    lon >= minX && lon <= maxX && lat >= minY && lat <= maxY &&
      Wkt.contains(lon, lat, entries(i)._3)
  }

  /** (layerId, value) pairs of every polygon containing the point, in
    * entry order (so downstream toMap last-wins semantics match the plain
    * linear scan exactly). */
  def query(lon: Double, lat: Double): Seq[(String, String)] = {
    val candidates = cells.getOrElse(key(cellOf(lon), cellOf(lat)),
      SpatialIndex.emptyInts)
    (candidates ++ broad).sorted.iterator
      .filter(i => hit(i, lon, lat))
      .map(i => (entries(i)._1, entries(i)._2))
      .toSeq
  }

  /** Sampled layer map for a point (last value wins per layerId, matching
    * the previous linear-scan toMap semantics). */
  def sample(lon: Double, lat: Double): Map[String, String] = query(lon, lat).toMap
}

object SpatialIndex {
  private val emptyInts = Array.empty[Int]

  def build(entries: Array[(String, String, Seq[Wkt.Ring])],
      cellSizeDeg: Double = 1.0, maxCellsPerEntry: Int = 4096): SpatialIndex = {
    val bboxes = entries.map { case (_, _, rings) =>
      var minX = Double.MaxValue; var minY = Double.MaxValue
      var maxX = Double.MinValue; var maxY = Double.MinValue
      rings.foreach(_.foreach { case (x, y) =>
        if (x < minX) minX = x; if (x > maxX) maxX = x
        if (y < minY) minY = y; if (y > maxY) maxY = y
      })
      (minX, minY, maxX, maxY)
    }
    def cellOf(v: Double): Int = math.floor(v / cellSizeDeg).toInt
    val cellMap = collection.mutable.Map[Long, List[Int]]()
    val broad = List.newBuilder[Int]
    entries.indices.foreach { i =>
      val (minX, minY, maxX, maxY) = bboxes(i)
      val x0 = cellOf(minX); val x1 = cellOf(maxX)
      val y0 = cellOf(minY); val y1 = cellOf(maxY)
      val span = (x1 - x0 + 1).toLong * (y1 - y0 + 1).toLong
      if (span > maxCellsPerEntry) broad += i
      else {
        var ix = x0
        while (ix <= x1) {
          var iy = y0
          while (iy <= y1) {
            val k = (ix.toLong << 32) | (iy & 0xffffffffL)
            cellMap(k) = i :: cellMap.getOrElse(k, Nil)
            iy += 1
          }
          ix += 1
        }
      }
    }
    new SpatialIndex(entries, cellSizeDeg,
      cellMap.view.mapValues(_.reverse.toArray).toMap, broad.result().toArray,
      bboxes)
  }
}
