package graft.text

import org.apache.spark.unsafe.types.UTF8String

/**
 * Model-based document quality scoring (the fastText-class keep/drop
 * filter every public curation pipeline applies — CCNet, RefinedWeb,
 * FineWeb): a FIXED-POINT linear classifier over hashed token features.
 *
 * score(doc) = bias + sum over tokens t of weights[h64(t) mod 256],
 * keep = score >= 0. All arithmetic is integer (|w| <= 127, so any doc
 * under ~3*10^13 tokens stays < 2^52), and the token hash is the shared
 * portable h64 = (poly31 << 31) | poly37 — the DuckDB oracle (q63)
 * replays the identical dot product bit-exactly via an inlined weight
 * table, the q52 trained-fixture recipe.
 *
 * The fixture (src/main/resources/graft/quality_weights.txt) is a
 * deterministic averaged perceptron trained by graft.tools.QualityTrain
 * on the synthetic corpus: positives are the corpus documents, hard
 * negatives their affine-substitution-ciphered corruptions (real token
 * lengths and spacing, garbage vocabulary) — the separation a trained
 * lexical quality model provides and a length/punct heuristic (q24)
 * cannot.
 */
object QualityModel {
  final val Buckets = 256

  lazy val (bias: Long, weights: Array[Long]) = {
    val in = getClass.getResourceAsStream("/graft/quality_weights.txt")
    require(in != null, "graft/quality_weights.txt fixture missing from resources")
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
    val b = lines.head.split(' ') match {
      case Array("bias", v) => v.toLong
      case other => sys.error(s"quality_weights.txt: bad bias line '${other.mkString(" ")}'")
    }
    val w = new Array[Long](Buckets)
    val seen = new Array[Boolean](Buckets)
    lines.tail.filter(_.nonEmpty).foreach { l =>
      val Array(i, v) = l.split(' ')
      val idx = i.toInt
      // named errors instead of a raw AIOOBE inside the lazy val, and
      // a duplicate+missing index pair can no longer pass the row-count
      // check with a silent hole left at 0
      require(idx >= 0 && idx < Buckets, s"quality_weights.txt: index $idx out of range")
      require(!seen(idx), s"quality_weights.txt: duplicate index $idx")
      seen(idx) = true
      w(idx) = v.toLong
    }
    require(seen.forall(identity),
      s"quality_weights.txt: expected $Buckets distinct weight rows")
    (b, w)
  }

  /** Integer quality margin of one document — one tokenize+hash pass
    * (the shared token-hash kernel), one table lookup per token. */
  def score(text: UTF8String): Long = {
    val hs = PortableHash.tokenShingleHashes(text, 1)
    var s = bias
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      s += weights((hs.getLong(i) % Buckets).toInt)
      i += 1
    }
    s
  }
}
