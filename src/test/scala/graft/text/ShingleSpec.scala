package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Token shingles + contamination: windowing edge cases (the
  * sequence(1,0)-descends parity trap) and end-to-end flagging. */
class ShingleSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("tokenShingles: windows, whitespace runs, and sub-n docs") {
    import spark.implicits._
    val rows = Seq(
      ("a", "one two three four five"), // 5 tokens -> 2 windows at n=4
      ("b", "one  two   three four"),   // multi-space runs collapse (4 tokens -> 1)
      ("c", "just three tokens"),       // < n -> EMPTY (not a [1,0] descent)
      ("d", ""))
      .toDF("doc_id", "text")
    val got = rows.select(col("doc_id"), TextOps.tokenShingles(col("text"), 4).as("sh"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("a") == List("one two three four", "two three four five"))
    assert(got("b") == List("one two three four"))
    assert(got("c") == Nil, s"sub-n doc produced ${got("c")}")
    assert(got("d") == Nil)
  }

  test("shingle-hash kernel matches the interpreted HOF formulation") {
    import spark.implicits._
    // the HOF reference: transform/slice windows re-joined with spaces,
    // hashed with the same packing — what the kernel replaced
    def hofShingles(c: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
      val toks = TextOps.tokens(c)
      when(size(toks) < n, typedLit(Array.empty[String])).otherwise(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
    }
    val docs = Seq(
      "key agg row scan slow fast table value",
      "one  two   three four five  ",
      "short one",
      "",
      "unicode café naïve résumé tokens here",
      "astral 😀 pairs 🚀 must iterate 😀🚀 codepoints not chars").toDF("text")
    // string kernel == HOF strings
    val both = docs.select(
      TextOps.tokenShingles(col("text"), 4).as("kern"),
      hofShingles(col("text"), 4).as("hof")).collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
    // hash kernel == per-shingle portable hash of the string kernel
    val hs = docs.select(
      TextOps.tokenShingleHashes(col("text"), 4).as("h"),
      TextOps.tokenShingles(col("text"), 4).as("s")).collect()
    // the packed poly31/poly37 fold tokenHashSql generates, computed
    // independently over the shingle string's codepoints
    def h64(s: String): Long = {
      val cps = s.codePoints().toArray
      var h31 = cps(0).toLong; var h37 = h31
      (1 until cps.length).foreach { j =>
        h31 = (h31 * 31 + cps(j)) % PortableHash.P
        h37 = (h37 * 37 + cps(j)) % PortableHash.P
      }
      (h31 << 31) | h37
    }
    hs.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[String](1).map(h64), r.toString)
    }
  }

  test("charNgramHashes: rolling hashes equal brute-force window folds") {
    def brute(s: String, n: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      (0 to cps.length - n).map { w =>
        var h31 = cps(w).toLong; var h37 = h31
        (1 until n).foreach { j =>
          h31 = (h31 * 31 + cps(w + j)) % PortableHash.P
          h37 = (h37 * 37 + cps(w + j)) % PortableHash.P
        }
        (h31 << 31) | h37
      }
    }
    for {
      s <- Seq("the quick brown fox", "aaaaaaaaaa", "café naïve", "ab", "", "a😀b🚀c")
      n <- Seq(1, 3, 5)
    } {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val got = PortableHash.charNgramHashes(u, n).toLongArray().toSeq
      val want = if (s.codePoints().count() < n) Nil else brute(s, n)
      assert(got == want, s"s='$s' n=$n: $got vs $want")
    }
  }

  test("substringContamination flags exactly the docs sharing a 20-char window") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "prefix THE SHARED SUBSTRING IS HERE suffix"),
      (101L, "completely unrelated text with other words entirely"),
      (102L, "x THE SHARED SUBSTRING IS HERE y THE SHARED SUBSTRING IS HERE z"))
      .toDF("doc_id", "text")
    val probes = Seq((1L, "eval set holds THE SHARED SUBSTRING IS HERE verbatim"))
      .toDF("doc_id", "text")
    val got = TextOps.substringContamination(corpus, probes, n = 20)
      .collect().map(r => r.getLong(0)).toSet
    assert(got == Set(100L, 102L), got.toString)
    // doc 102 contains the shared region twice -> more hits than 100
    val hits = TextOps.substringContamination(corpus, probes, n = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(102L) > hits(100L), hits.toString)
  }

  test("contamination flags exactly the overlapping docs") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "completely unrelated text with other words entirely"),
      (102L, "we said the quick brown fox twice the quick brown fox"))
      .toDF("doc_id", "text")
    val probes = Seq((1L, "a quick brown fox jumps here")).toDF("doc_id", "text")
    val got = TextOps.contamination(corpus, probes, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // probe shingles include "quick brown fox" and "brown fox jumps":
    // doc 100 matches both once (hits 2, distinct 2); doc 102 matches
    // "quick brown fox" twice (hits 2, distinct 1); doc 101 never
    assert(got == Set((100L, 2L, 2L), (102L, 2L, 1L)), got.toString)
  }

  test("repetition metrics: planted repetition, degenerate and tiny docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"),        // 4 toks, 1 distinct; 3 identical 2-grams
      (2L, "a b a b a"),                  // alternation: "a b" x2 + "b a" x2
      (3L, "all tokens differ here"),     // no repetition: top2 = 1
      (4L, "solo"),                       // 1 token -> no 2-grams
      (5L, ""))                           // empty -> all zero
      .toDF("doc_id", "text")
    val got = TextOps.repetitionMetrics(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got(1L) == ((4L, 1L, 3L, 3L, 1L)), got(1L).toString)
    assert(got(2L) == ((5L, 2L, 4L, 2L, 2L)), got(2L).toString)
    assert(got(3L) == ((4L, 4L, 3L, 1L, 3L)), got(3L).toString)
    assert(got(4L) == ((1L, 1L, 0L, 0L, 0L)), got(4L).toString)
    assert(got(5L) == ((0L, 0L, 0L, 0L, 0L)), got(5L).toString)
  }
}
