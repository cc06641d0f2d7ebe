package graft.text

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Engine-portable signature hashes: every primitive here is pure
 * integer (or exactly-reproducible double) arithmetic that DuckDB can
 * compute with `list_reduce`/`list_transform`, so the MinHash / SimHash
 * / random-hyperplane LSH pipelines get full SQL oracles instead of
 * engine-only checks. One Scala object generates BOTH the JVM kernels
 * (invoked from codegen'd Catalyst expressions — the hot path) and the
 * DuckDB SQL text (the oracle), so the two can never drift.
 *
 * Hash design:
 *  - Base string hash: polynomial fold `h -> (h*31 + c) % (2^31-1)`
 *    seeded with the first char code (list_reduce-compatible; the same
 *    scheme as the q25 fingerprint).
 *  - MinHash permutation p: affine `(A_p*h + B_p) % (2^31-1)` over the
 *    base shingle hash (classic universal hashing; products stay under
 *    2^62 so BIGINT math is exact in both engines).
 *  - Texts are sanitized to [a-z ] first (byte == codepoint, so
 *    DuckDB's ascii() and a JVM byte loop agree on any input).
 */
object PortableHash {
  final val P = 2147483647L // 2^31 - 1

  /** Deterministic affine constants for MinHash permutations
    * (xorshift64; embedded as literals in the oracle SQL). */
  private def gen(n: Int): (Array[Long], Array[Long]) = {
    var s = 88172645463325252L
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    val a = new Array[Long](n); val b = new Array[Long](n)
    var i = 0
    while (i < n) {
      a(i) = Math.floorMod(next(), P - 1) + 1 // in [1, P-1]
      b(i) = Math.floorMod(next(), P)         // in [0, P-1]
      i += 1
    }
    (a, b)
  }
  final val MaxPerms = 64
  private val (permA, permB) = gen(MaxPerms)
  def a(p: Int): Long = permA(p)
  def b(p: Int): Long = permB(p)

  /** keep only bytes in [a-z ] — identical to
    * regexp_replace(text, '[^a-z ]', '') because multi-byte UTF-8 units
    * are >= 0x80 and never in the keep set. */
  private def clean(text: UTF8String): (Array[Byte], Int) = {
    val bytes = text.getBytes
    val buf = new Array[Byte](bytes.length)
    var m = 0; var i = 0
    while (i < bytes.length) {
      val c = bytes(i)
      if ((c >= 'a' && c <= 'z') || c == ' ') { buf(m) = c; m += 1 }
      i += 1
    }
    (buf, m)
  }

  /** MinHash signature over character `k`-shingles of the sanitized
    * text: perms mins of the affine-permuted shingle hashes. Duplicate
    * shingles never change a min, so no distinct pass is needed.
    * Texts with fewer than k clean chars yield no shingles — callers
    * filter those out (the SQL side does the same). */
  def minhashSig(text: UTF8String, k: Int, perms: Int): GenericArrayData = {
    val (buf, m) = clean(text)
    val mins = new Array[Long](perms)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var s = 0
    while (s <= m - k) {
      var h = (buf(s) & 0xFFL)
      var j = 1
      while (j < k) { h = (h * 31 + (buf(s + j) & 0xFFL)) % P; j += 1 }
      var p = 0
      while (p < perms) {
        val aff = (permA(p) * h + permB(p)) % P
        if (aff < mins(p)) mins(p) = aff
        p += 1
      }
      s += 1
    }
    if (m < k) java.util.Arrays.fill(mins, 0L)
    new GenericArrayData(mins)
  }

  /** 62-bit SimHash over whitespace tokens of the sanitized text.
    * Token hash packs two 31-bit polynomial hashes (bases 31 and 37):
    * h64 = (h31 << 31) | h37 — 62 meaningful bits, always >= 0, so
    * BIGINT bit ops agree across engines. */
  def simhash62(text: UTF8String): Long = {
    val (buf, m) = clean(text)
    val counters = new Array[Int](62)
    var ntok = 0
    var i = 0
    while (i < m) {
      if (buf(i) != ' ') {
        var h31 = (buf(i) & 0xFFL); var h37 = h31
        var j = i + 1
        while (j < m && buf(j) != ' ') {
          val c = buf(j) & 0xFFL
          h31 = (h31 * 31 + c) % P
          h37 = (h37 * 37 + c) % P
          j += 1
        }
        val h64 = (h31 << 31) | h37
        ntok += 1
        var b0 = 0
        while (b0 < 62) { counters(b0) += ((h64 >>> b0) & 1L).toInt; b0 += 1 }
        i = j
      } else i += 1
    }
    if (ntok == 0) return 0L
    var out = 0L; var b0 = 0
    while (b0 < 62) { if (2L * counters(b0) >= ntok) out |= 1L << b0; b0 += 1 }
    out
  }

  /** LSH band key: polynomial fold of the band's signature slice,
    * seeded with (band+1) so keys never collide across bands. */
  def bandKey(sig: ArrayData, band: Int, rows: Int): Long = {
    var acc = band + 1L
    var j = 0
    while (j < rows) { acc = (acc * 1000003L + sig.getLong(band * rows + j)) % P; j += 1 }
    acc
  }

  /** Fused minhash -> band keys (one kernel call per row; feeding a
    * separate sig column into per-band folds would get inlined by
    * project collapse and recompute the signature rows*bands times). */
  def minhashBands(text: UTF8String, k: Int, bands: Int, rows: Int): GenericArrayData = {
    val sig = minhashSig(text, k, bands * rows)
    new GenericArrayData(Array.tabulate(bands)(b => bandKey(sig, b, rows)))
  }

  /** Token boundaries of `s` as flat (start, end) offsets: maximal runs
    * of non-space chars — EXACTLY the split(s, " ")-and-drop-empties
    * token definition shared with the SQL oracles (TextOps.tokens). */
  private def tokenBounds(s: String): Array[Int] = {
    val out = new java.util.ArrayList[Integer]()
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.charAt(i) != ' ') {
        val start = i
        while (i < n && s.charAt(i) != ' ') i += 1
        out.add(start); out.add(i)
      } else i += 1
    }
    val arr = new Array[Int](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    arr
  }

  /** h64 = (poly31 << 31) | poly37 over the codepoints of one token
    * window joined with single spaces — appended into (h31, h37)
    * accumulators. Codepoint iteration matches DuckDB's
    * string_split(s, '') + ascii() exactly (ascii returns the
    * codepoint of a multi-byte char, not a byte). */
  private def foldRange(s: String, from: Int, to: Int, h: Array[Long], first: Boolean): Boolean = {
    var i = from
    var f = first
    while (i < to) {
      val cp = s.codePointAt(i)
      if (f) { h(0) = cp; h(1) = cp; f = false }
      else { h(0) = (h(0) * 31 + cp) % P; h(1) = (h(1) * 37 + cp) % P }
      i += Character.charCount(cp)
    }
    f
  }

  /** Token `n`-gram shingle hashes in ONE pass over the text: tokenize
    * once, then hash each n-token window (joined with single spaces) as
    * h64 = (poly31 << 31) | poly37 — the same packing as
    * [[tokenHashSql]], so the DuckDB oracle reproduces every value. The
    * 8-byte keys are the 100 TB shape for contamination joins: the
    * shingle STRINGS never materialize, and per-doc work is
    * O(chars * n), not the O(tokens^2) of re-splitting per window. */
  def tokenShingleHashes(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    val b = tokenBounds(s)
    val m = b.length / 2
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m - n + 1)
    val h = new Array[Long](2)
    var w = 0
    while (w <= m - n) {
      var first = true
      var t = 0
      while (t < n) {
        if (!first) { h(0) = (h(0) * 31 + 32) % P; h(1) = (h(1) * 37 + 32) % P }
        first = foldRange(s, b(2 * (w + t)), b(2 * (w + t) + 1), h, first)
        t += 1
      }
      out(w) = (h(0) << 31) | h(1)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Token `n`-gram shingle STRINGS (windows joined with single spaces)
    * in one tokenize pass — the exact-string variant of
    * [[tokenShingleHashes]] for oracle-scale verification and callers
    * that need the text itself. */
  def tokenShingles(text: UTF8String, n: Int): GenericArrayData = {
    val s = text.toString
    val b = tokenBounds(s)
    val m = b.length / 2
    if (m < n) return new GenericArrayData(Array.empty[AnyRef])
    val out = new Array[AnyRef](m - n + 1)
    val sb = new java.lang.StringBuilder
    var w = 0
    while (w <= m - n) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(s, b(2 * (w + t)), b(2 * (w + t) + 1))
        t += 1
      }
      out(w) = UTF8String.fromString(sb.toString)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Per-LINE h64 hashes (split at codepoint 10, trailing empties kept
    * — string_split semantics): the stats pass of boilerplate-line
    * removal. Empty lines hash to 0 on both engines (list_reduce over
    * [''] is ascii('') = 0). One codepoint pass, no line strings
    * materialize. */
  def lineHashes(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[java.lang.Long]()
    val h = new Array[Long](2)
    var first = true
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp == 10) {
        out.add((h(0) << 31) | h(1))
        h(0) = 0; h(1) = 0; first = true
      } else {
        if (first) { h(0) = cp; h(1) = cp; first = false }
        else { h(0) = (h(0) * 31 + cp) % P; h(1) = (h(1) * 37 + cp) % P }
      }
      i += Character.charCount(cp)
    }
    out.add((h(0) << 31) | h(1)) // last line (empty for trailing \n)
    val arr = new Array[Long](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  /** Rewrite pass of boilerplate-line removal: drop every line whose
    * h64 is in the SORTED `hot` array (binary search per line), keep
    * the rest in order joined with \n. Returns (clean_text, n_lines,
    * n_kept) as one struct row — one pass, one kernel call per doc. */
  def dropHotLines(text: UTF8String, hot: Array[Long]): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val s = text.toString
    val sb = new java.lang.StringBuilder
    val h = new Array[Long](2)
    var first = true
    var nLines = 0L
    var nKept = 0L
    var lineStart = 0
    var i = 0
    val n = s.length
    def flush(end: Int): Unit = {
      nLines += 1
      if (java.util.Arrays.binarySearch(hot, (h(0) << 31) | h(1)) < 0) {
        if (nKept > 0) sb.append('\n')
        sb.append(s, lineStart, end)
        nKept += 1
      }
      h(0) = 0; h(1) = 0; first = true
    }
    while (i < n) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      if (cp == 10) { flush(i); lineStart = i + w }
      else if (first) { h(0) = cp; h(1) = cp; first = false }
      else { h(0) = (h(0) * 31 + cp) % P; h(1) = (h(1) * 37 + cp) % P }
      i += w
    }
    flush(n)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(sb.toString), nLines, nKept))
  }

  /** Character `n`-gram hashes of the raw text via ROLLING poly31/poly37
    * folds over codepoints (h' = (h - c_out*31^(n-1))*31 + c_in mod P):
    * one O(chars) pass regardless of n. Window w covers codepoints
    * [w, w+n); h64 packs both folds like [[tokenHashSql]]. These are
    * the seeds for exact-substring decontamination: two texts share an
    * n-char substring iff they share a window hash (modulo ~2^-62
    * collisions, which flag false POSITIVES only — acceptable for a
    * contamination filter, and the DuckDB oracle hashes identically). */
  def charNgramHashes(text: UTF8String, n: Int): GenericArrayData = {
    // decode to a codepoint array once (codepoint == DuckDB character)
    val cps = text.toString.codePoints().toArray
    val m = cps.length
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m - n + 1)
    charNgramWalk(cps, n, (w, h64) => out(w) = h64)
    new GenericArrayData(out)
  }

  /** THE rolling char-n-gram recurrence (single source — the oracle SQL
    * and BOTH duplicate-span variants reproduce these exact values):
    * h' = (h - c_out*base^(n-1))*base + c_in mod P for base in {31, 37},
    * emitted per window as h64 = (poly31 << 31) | poly37. */
  private def charNgramWalk(cps: Array[Int], n: Int, emit: (Int, Long) => Unit): Unit = {
    val m = cps.length
    var pow31 = 1L; var pow37 = 1L
    var j = 0
    while (j < n - 1) { pow31 = pow31 * 31 % P; pow37 = pow37 * 37 % P; j += 1 }
    var h31 = cps(0).toLong % P
    var h37 = h31
    j = 1
    while (j < n) {
      h31 = (h31 * 31 + cps(j)) % P
      h37 = (h37 * 37 + cps(j)) % P
      j += 1
    }
    emit(0, (h31 << 31) | h37)
    var w = 1
    while (w <= m - n) {
      val cOut = cps(w - 1).toLong
      val cIn = cps(w + n - 1).toLong
      h31 = Math.floorMod((h31 - cOut * pow31 % P) * 31 + cIn, P)
      h37 = Math.floorMod((h37 - cOut * pow37 % P) * 37 + cIn, P)
      emit(w, (h31 << 31) | h37)
      w += 1
    }
  }

  /** [[charNgramHashes]] plus each window's BYTES, still one O(chars)
    * pass: array of (h64, snip) structs where snip equals
    * substring(text, w+1, n) in codepoint semantics (what the DuckDB
    * oracle computes and what [[charNgramHashes]] hashes). Exists
    * because extracting the snippet with a per-window substring() seeks
    * O(w) characters per call — quadratic per document — while this
    * slides the window incrementally. Feeds the single-scan
    * duplicate-span projection, where every window's bytes must
    * materialize alongside its hash. */
  def charNgramSnips(text: UTF8String, n: Int): GenericArrayData = {
    val cps = text.toString.codePoints().toArray
    val m = cps.length
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    charNgramWalk(cps, n, (w, h64) => out(w) = org.apache.spark.sql.catalyst.InternalRow(
      h64, UTF8String.fromString(new String(cps, w, n))))
    new GenericArrayData(out)
  }

  // ---------- DuckDB SQL generators (the oracle side) ----------

  /** `(h*base + c) % P` char fold of a string expression (DuckDB). */
  def polySql(str: String, base: Int): String =
    s"list_reduce(list_transform(string_split($str, ''), c -> ascii(c)::BIGINT), (h, c) -> (h*$base + c) % $P)"

  def cleanSql(col: String): String = s"regexp_replace($col, '[^a-z ]', '', 'g')"

  /** Per-document MinHash signature as a BIGINT list literal. */
  def minhashSigSql(hhCol: String, perms: Int): String =
    (0 until perms).map(p =>
      s"list_min(list_transform($hhCol, h -> (${permA(p)}*h + ${permB(p)}) % $P))"
    ).mkString("[", ", ", "]")

  /** Band-key fold over a 1-based sig list column (DuckDB). */
  def bandKeySql(sigCol: String, band: Int, rows: Int): String = {
    var acc = s"${band + 1}"
    var j = 0
    while (j < rows) { acc = s"(($acc) * 1000003 + $sigCol[${band * rows + j + 1}]) % $P"; j += 1 }
    s"($acc)"
  }

  /** SimHash of a token-hash list column + token count column. */
  def simhashSql(hhCol: String, nCol: String): String = {
    val bits = (0 until 62).map { b0 =>
      s"CASE WHEN 2*CAST(list_sum(list_transform($hhCol, h -> (h >> $b0) & 1)) AS BIGINT) >= $nCol THEN (1::BIGINT << $b0) ELSE 0 END"
    }.mkString(" + ")
    s"CASE WHEN $nCol = 0 THEN 0 ELSE ($bits) END"
  }

  /** token hash h64 = (poly31 << 31) | poly37 (DuckDB, per token t). */
  def tokenHashSql(t: String): String =
    s"((${polySql(t, 31)} << 31) | ${polySql(t, 37)})"
}

/**
 * Random-hyperplane signature kernel for embedding LSH. The plane
 * component for (plane p, dim i) is a pure-integer mix reduced to a
 * fixed-point double in [-0.5, 0.5) — exactly computable in DuckDB —
 * and the projection is the same sequential double fold as the dot
 * product oracle, so the sign bits (hence buckets and candidates)
 * match the SQL oracle bit-for-bit.
 */
object RhpSig {
  final val P = 2147483647L

  /** integer mix — every intermediate stays under 2^63 for p < 64 and
    * i < 2^20, so BIGINT arithmetic is exact in both engines. */
  def comp(p: Int, i: Int): Double = {
    var h = ((p.toLong * 1000003L + i + 12345L) * 2654435761L) % P
    h = (h * 2654435761L + 104729L) % P
    (h % 1000000L).toDouble / 1000000.0 - 0.5
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nPlanes, dim), { case (np, d) =>
      Array.tabulate(np, d)((p, i) => comp(p, i))
    })

  /** sign-bit signature of a float-array embedding (bit p set iff the
    * projection on plane p is >= 0). */
  def signature(v: ArrayData, nPlanes: Int): Long = {
    val dim = v.numElements()
    val w = planes(nPlanes, dim)
    var sig = 0L; var p = 0
    while (p < nPlanes) {
      val wp = w(p)
      var s = 0.0; var i = 0
      while (i < dim) { s += v.getFloat(i).toDouble * wp(i); i += 1 }
      if (s >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  /** Raw plane projections — the Johnson–Lindenstrauss dimensionality
    * reduction whose sign bits [[signature]] quantizes. Same planes,
    * same sequential left-to-right fold, so every value matches the
    * DuckDB list_reduce oracle bit-for-bit. */
  def projections(v: ArrayData, nPlanes: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val dim = v.numElements()
    val w = planes(nPlanes, dim)
    val out = new Array[Double](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val wp = w(p)
      var s = 0.0; var i = 0
      while (i < dim) { s += v.getFloat(i).toDouble * wp(i); i += 1 }
      out(p) = s
      p += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** DuckDB expression for comp(p, i) with a 1-BASED index expr `i1`. */
  def compSql(p: String, i1: String): String =
    s"((((((($p)*1000003 + ($i1) - 1 + 12345) * 2654435761) % $P) * 2654435761 + 104729) % $P) % 1000000)::DOUBLE / 1000000.0 - 0.5"
}
