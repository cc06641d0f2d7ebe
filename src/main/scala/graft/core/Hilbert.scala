package graft.core

/**
 * Hilbert-curve key over 32-bit world coordinates — the alternative
 * space-filling clustering order (vs the Z-order of Cell). Hilbert keys
 * have better locality (no Z-order "jumps"), so range partitioning on
 * them yields tighter spatial partitions for PIP/kNN workloads; Z-order
 * remains the default because it reproduces the reference's file order
 * bit-for-bit.
 *
 * Standard public Hilbert d2xy/xy2d construction (Warren, "Hacker's
 * Delight" variant) over 32 levels; returns order-comparable signed
 * Longs via the same sign-flip convention as Cell.
 */
object Hilbert {
  /** (x,y) 32-bit world coords -> order-comparable Hilbert index. */
  def encode(x32: Int, y32: Int): Long = {
    var rx = 0L
    var ry = 0L
    var d = 0L
    var x = x32.toLong & 0xFFFFFFFFL
    var y = y32.toLong & 0xFFFFFFFFL
    var s = 1L << 31
    while (s > 0) {
      rx = if ((x & s) != 0) 1 else 0
      ry = if ((y & s) != 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      x &= s - 1
      y &= s - 1
      s >>= 1
    }
    d ^ Long.MinValue
  }

  /** Inverse: Hilbert index -> (x, y) as unsigned 32-bit in Longs. */
  def decode(cell: Long): (Long, Long) = {
    var t = cell ^ Long.MinValue // raw unsigned index bits
    var x = 0L
    var y = 0L
    var s = 1L
    while (s < (1L << 32)) {
      val rx = 1L & (t >>> 1) // unsigned shifts: t uses all 64 bits
      val ry = 1L & (t ^ rx)
      // rotate back
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t >>>= 2
      s <<= 1
    }
    (x, y)
  }
}
