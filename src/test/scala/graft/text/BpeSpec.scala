package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Golden contract for the learned-vocab BPE kernel: the fixture's
  * encodings are pinned as literals (precomputed, hand-spot-checked
  * against the ranked merges), so a fixture or algorithm drift fails
  * loudly instead of silently shifting token budgets. The q52 DuckDB
  * oracle replays the same merges independently via unrolled SQL. */
class BpeSpec extends AnyFunSuite {

  test("fixture loads with ranked merges") {
    assert(Bpe.merges.length == 25)
    assert(Bpe.merges.head == ("e", "r"))
    assert(Bpe.merges.last == ("co", "lu"))
  }

  test("golden encodings for the corpus vocabulary") {
    val golden = Map(
      "spark" -> "s|par|k", "window" -> "w|in|d|ow", "merge" -> "mer|g|e",
      "table" -> "t|a|b|l|e", "column" -> "colu|m|n", "vector" -> "v|e|c|t|or",
      "stream" -> "st|r|e|a|m", "value" -> "v|a|lu|e", "data" -> "d|at|a",
      "small" -> "s|m|a|l|l", "join" -> "join", "filter" -> "f|i|l|t|er",
      "big" -> "b|i|g", "group" -> "g|r|o|u|p", "hash" -> "hash",
      "customer" -> "cu|st|o|mer", "sort" -> "s|or|t", "order" -> "or|d|er",
      "slow" -> "s|l|ow", "line" -> "l|in|e", "part" -> "par|t",
      "fast" -> "f|a|st", "the" -> "t|h|e", "row" -> "row", "agg" -> "a|g|g",
      "key" -> "k|e|y", "query" -> "q|u|er|y", "a" -> "a", "scan" -> "scan",
      "batch" -> "batch", "dup" -> "d|u|p")
    golden.foreach { case (w, enc) =>
      assert(Bpe.encode(w).mkString("|") == enc, s"encode($w)")
    }
  }

  test("greedy lowest-rank merge semantics (hand-traced)") {
    // "row": (o,w) rank 2 before (r,ow) rank 15 — two rounds to 1 token
    assert(Bpe.encode("row") == Vector("row"))
    // "spark": (a,r)=8 -> ar; (p,ar)=9 -> par; no (s,par) merge
    assert(Bpe.encode("spark") == Vector("s", "par", "k"))
    // repeated pair merges left-to-right, all occurrences in one round
    assert(Bpe.encode("erer") == Vector("er", "er"))
    // unknown word: stays characters
    assert(Bpe.encode("zzz") == Vector("z", "z", "z"))
    assert(Bpe.encode("") == Vector.empty)
  }

  test("document token count: pre-tokenizer parity + learned counts") {
    def cnt(s: String): Long = Bpe.tokenCount(UTF8String.fromString(s))
    // the|customer|123|batch|! = 3 + 4 + 3 + 1 + 1
    assert(cnt("the customer 123 batch!") == 12L)
    assert(cnt("") == 0L)
    assert(cnt("   \t\n") == 0L)
    // mixed runs split like the regex: "agg42row" = agg + 42 + row
    assert(cnt("agg42row") == (3 + 2 + 1).toLong)
    // non-ASCII: one pre-token per codepoint (surrogate pair = ONE)
    assert(cnt(new String(Character.toChars(0xE9))) == 1L) // é (NFC)
    assert(cnt(new String(Character.toChars(0x1D11E))) == 1L)
    // punctuation separates, each mark its own token
    assert(cnt("a,b.c") == 5L)
  }

  test("kernel equals a regex-based reference on arbitrary text") {
    val r = new scala.util.Random(42)
    val words = Seq("spark", "join", "zzz", "customer", "42", "!", "the")
    (0 until 50).foreach { _ =>
      val doc = Seq.fill(1 + r.nextInt(20))(words(r.nextInt(words.length)))
        .mkString(Seq(" ", "  ", "\t")(r.nextInt(3)))
      val viaRegex = TextOps.BpePattern.r.findAllIn(doc)
        .map(w => Bpe.encode(w).length.toLong).sum
      assert(Bpe.tokenCount(UTF8String.fromString(doc)) == viaRegex, s"doc='$doc'")
    }
  }
}
