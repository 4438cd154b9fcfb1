package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for spatial write layout.
  *
  * Sorting/range-partitioning occurrence tables by `zValue(lat, lon)`
  * before writing gives parquet row groups spatial locality, so bounding-box
  * predicates prune row groups by min/max stats — the missing half of the
  * "partition by resource, Z-order by location" layout the 100 TB design
  * notes call for (the reference gets the same effect from its spatial
  * cache keyed by rounded coordinates,
  * `caches/SpatialLayerDAO.scala` in
  * /root/reference/src/main/scala/au/org/ala/biocache/).
  *
  * Pure column algebra (shift/mask bit spreading) — codegen'd, map-only,
  * and byte-for-byte reproducible in any engine with 64-bit integers (the
  * q69 oracle recomputes it in DuckDB).
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to even positions (Morton split). */
  private def spread16(v: Column): Column = {
    val a = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code over 16-bit-quantised WGS84 coordinates: cell
    * ~600 m at the equator — finer than any row-group pruning needs.
    * Out-of-range coordinates are the caller's problem (validate upstream;
    * the enrichment pipeline already asserts on them). */
  def zValue(lat: Column, lon: Column): Column = {
    val latQ = floor((lat + lit(90.0)) / lit(180.0) * lit(65535.0))
      .cast("long")
    val lonQ = floor((lon + lit(180.0)) / lit(360.0) * lit(65535.0))
      .cast("long")
    spread16(latQ).bitwiseOR(shiftleft(spread16(lonQ), 1))
  }
}
