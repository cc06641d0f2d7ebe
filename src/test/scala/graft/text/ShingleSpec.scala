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
}
