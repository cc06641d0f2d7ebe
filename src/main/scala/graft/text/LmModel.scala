package graft.text

import org.apache.spark.unsafe.types.UTF8String

/**
 * N-gram language-model perplexity scoring (the CCNet/KenLM-style
 * fluency filter public curation pipelines bucket documents with):
 * a hashed-bucket BIGRAM model with add-one smoothing, trained offline
 * on the synthetic corpus by graft.tools.LmTrain and evaluated in
 * FIXED POINT so the DuckDB oracle (q65) replays it bit-exactly.
 *
 * cost(doc) = sum over consecutive token pairs (p, t) of
 *   costs[bucket(h64(p), h64(t))]
 * where costs[b] = round(-log10((count[b]+1)/(total+B)) * 1e6) are
 * integer micro-log10 negative probabilities, and the average cost per
 * bigram is the perplexity proxy (monotone in log-perplexity). Lower =
 * more fluent under the training distribution; the fixture's tercile
 * boundaries over the training corpus give the CCNet head/middle/tail
 * bucket.
 *
 * All arithmetic stays overflow-safe on BOTH engines: each cost
 * < log10(total+B)*1e6 < 2^23, so any document under ~2^29 tokens sums
 * < 2^52 (Spark ANSI and DuckDB agree); the pair bucket
 * ((hp % 2^26) * PairMul + (hc % 2^26)) % Buckets keeps every
 * intermediate < 2^52.
 *
 * Token hashes are the shared portable h64 = (poly31 << 31) | poly37
 * (PortableHash), the SINGLE source for JVM kernels and oracle SQL.
 */
object LmModel {
  /** Prime bucket count: `key % Buckets` mixes all key bits. */
  final val Buckets = 1021
  /** 2^26 — reduces each token hash before pairing. */
  final val PairMod = 67108864L
  /** Prime just under 2^26: PairMod * PairMul < 2^52. */
  final val PairMul = 67108859L

  lazy val (headMax: Long, midMax: Long, costs: Array[Long]) = {
    val in = getClass.getResourceAsStream("/graft/lm_bigram.txt")
    require(in != null, "graft/lm_bigram.txt fixture missing from resources")
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
    def hdr(name: String, l: String): Long = l.split(' ') match {
      case Array(`name`, v) => v.toLong
      case other => sys.error(s"lm_bigram.txt: bad $name line '${other.mkString(" ")}'")
    }
    val h = hdr("headmax", lines(0))
    val m = hdr("midmax", lines(1))
    val c = new Array[Long](Buckets)
    val seen = new Array[Boolean](Buckets)
    val body = lines.drop(2).filter(_.nonEmpty)
    require(body.length == Buckets, s"lm_bigram.txt: expected $Buckets cost rows, got ${body.length}")
    body.foreach { l =>
      val Array(i, v) = l.split(' ')
      val idx = i.toInt
      require(idx >= 0 && idx < Buckets, s"lm_bigram.txt: index $idx out of range")
      require(!seen(idx), s"lm_bigram.txt: duplicate index $idx")
      seen(idx) = true
      c(idx) = v.toLong
    }
    require(c.forall(v => v > 0 && v < (1L << 23)), "lm_bigram.txt: cost out of (0, 2^23)")
    require(h <= m, "lm_bigram.txt: tercile boundaries out of order")
    (h, m, c)
  }

  /** Hash-pair bucket, identical to the oracle's integer expression. */
  def bucket(hp: Long, hc: Long): Int =
    (((hp % PairMod) * PairMul + (hc % PairMod)) % Buckets).toInt

  /** Total integer bigram cost of one document — one tokenize+hash pass
    * (the shared token-hash kernel), one table lookup per bigram. */
  def cost(text: UTF8String): Long = {
    val hs = PortableHash.tokenShingleHashes(text, 1)
    val n = hs.numElements()
    var s = 0L
    var i = 1
    while (i < n) {
      s += costs(bucket(hs.getLong(i - 1), hs.getLong(i)))
      i += 1
    }
    s
  }
}
