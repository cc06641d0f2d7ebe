package graft.core

/**
 * WGS84 lat/lon <-> web-mercator "world coordinates" at zoom 32
 * (slippy-map formula). World coordinates are 32-bit unsigned ints
 * carried in `Int` (bit pattern) or widened to `Long` in [0, 2^32).
 *
 * Semantics match the reference engine exactly, including truncation
 * (not rounding) on the double -> uint32 conversion
 * (reference: util.c:34-48, encode.c:91-105).
 */
object Mercator {
  final val LatLimit = 85.0511 // web-mercator latitude limit
  final val WorldSize = 4294967296.0 // 2^32

  /** A lat/lon is representable iff |lat| <= 85.0511 and -180 < lon < 180
    * (reference drops the whole record otherwise, encode.c:91-105). */
  def valid(lat: Double, lon: Double): Boolean =
    lat <= LatLimit && lat >= -LatLimit && lon < 180.0 && lon > -180.0

  /** lon -> world x in [0, 2^32), truncating like C's double->uint cast. */
  def lonToX32(lon: Double): Long =
    (WorldSize * ((lon + 180.0) / 360.0)).toLong

  /** lat -> world y in [0, 2^32), truncating. Operation order matches
    * util.c:39: n * (1 - (log(tan(r) + 1/cos(r)) / pi)) / 2. */
  def latToY32(lat: Double): Long = {
    val latRad = lat * math.Pi / 180.0
    (WorldSize * (1.0 - (math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi)) / 2.0).toLong
  }

  /** World (or tile-at-zoom) coordinates back to lat/lon of the tile's
    * top-left corner (util.c:43-48). x,y unsigned at `zoom`. */
  def tileToLon(x: Long, zoom: Int): Double = {
    val n = 1L << zoom
    360.0 * x / n - 180.0
  }

  def tileToLat(y: Long, zoom: Int): Double = {
    val n = 1L << zoom
    val latRad = math.atan(math.sinh(math.Pi * (1.0 - 2.0 * y / n)))
    latRad * 180.0 / math.Pi
  }

  /** World coordinate -> fractional position within tile (z,x,y)
    * (util.c:51-61). Result may be outside [0,1) for coords outside
    * the tile (used when rasterizing neighbors). */
  def worldToTileFracX(wx: Long, z: Int, tx: Int): Double =
    (wx - (tx.toLong << (32 - z))).toDouble / (1L << (32 - z))

  def worldToTileFracY(wy: Long, z: Int, ty: Int): Double =
    (wy - (ty.toLong << (32 - z))).toDouble / (1L << (32 - z))
}
