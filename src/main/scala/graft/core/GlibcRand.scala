package graft.core

/**
 * Bit-exact reimplementation of glibc's default `rand()` (the TYPE_3
 * additive-feedback generator, degree 31 / separation 3 — the
 * algorithm documented in glibc's random_r): 31-word state seeded by a
 * Park-Miller LCG, 310 warm-up outputs discarded, then
 * `state[f] += state[p]; out = (uint32)state[f] >> 1` with both
 * pointers cycling. The reference engine seeds `srand(x*37 + y)` per
 * cloud record (render.c:288) and draws dot positions from
 * `rand() & (INT_MAX-1)` pairs — reproducing the stream makes circle
 * mode pixel-identical instead of a documented deviation.
 */
final class GlibcRand(seedIn: Long) {
  private val r = new Array[Int](31)
  private var f = 3 // additive feedback pointer
  private var p = 0 // read pointer

  locally {
    var seed = seedIn & 0xFFFFFFFFL // srand takes unsigned int
    if (seed == 0) seed = 1
    r(0) = seed.toInt
    // glibc's LCG runs on `int32_t word = seed` with C trunc-division
    // semantics (negative for seeds >= 2^31); products need 64 bits
    var word = seed.toInt.toLong
    var i = 1
    while (i < 31) {
      val hi = word / 127773 // Long / is trunc-toward-zero like C
      val lo = word % 127773
      word = 16807 * lo - 2836 * hi
      if (word < 0) word += 2147483647L
      r(i) = word.toInt
      i += 1
    }
    var k = 310 // 10 * degree warm-up discards
    while (k > 0) { next(); k -= 1 }
  }

  /** next random value in [0, 2^31): ((uint32)(state[f] += state[p])) >> 1 */
  def next(): Int = {
    r(f) = r(f) + r(p) // int32 wraparound on purpose
    val out = r(f) >>> 1
    f += 1
    if (f >= 31) { f = 0; p += 1 }
    else { p += 1; if (p >= 31) p = 0 }
    out
  }

  /** the reference's uniform draw: ((double)(rand() & (INT_MAX-1))) / INT_MAX */
  def nextU(): Double = (next() & (Int.MaxValue - 1)).toDouble / Int.MaxValue
}
