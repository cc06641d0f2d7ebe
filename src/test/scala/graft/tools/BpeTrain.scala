package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * One-shot BPE vocabulary trainer: learns a GPT-2-format merges file
 * (classic Sennrich/GPT-2 byte-pair algorithm — count adjacent symbol
 * pairs weighted by word frequency, merge the most frequent, repeat)
 * from the synthetic documents corpus and writes the fixture consumed
 * by graft.text.Bpe. Deterministic: ties break on the lexicographically
 * smaller pair, so re-running on the same corpus reproduces the file
 * byte-exactly.
 *
 * Usage: sbt "Test/runMain graft.tools.BpeTrain /root/testdata/sf0.01 25
 *              src/main/resources/graft/bpe_merges.txt"
 */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nMerges = args(1).toInt
    val outPath = args(2)
    val spark = SparkSession.builder().master("local[8]")
      .appName("bpe-train").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // word -> frequency under the shared pre-tokenizer (TextOps.BpePattern)
    val freqs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.text.TextOps.bpeTokens(col("text"))).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.stop()

    // seed symbols are CODEPOINTS, not UTF-16 chars — Bpe.encode and the
    // DuckDB replay (string_split(word, '')) both work in codepoints, so
    // char-seeding would learn lone-surrogate merges the encoder can
    // never match on supplementary-plane text
    var words: Map[Vector[String], Long] =
      freqs.map { case (w, f) =>
        w.codePoints().toArray.toVector
          .map(cp => new String(Character.toChars(cp))) -> f
      }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val (best, cnt) = pairCounts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        if (cnt < 2) done = true // a pair seen once is noise, stop
        else {
          merges += best
          val ab = best._1 + best._2
          words = words.map { case (syms, f) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                out += ab; i += 2
              } else { out += syms(i); i += 1 }
            }
            out.result() -> f
          }
          m += 1
        }
      }
    }
    val lines = "#version: 0.2 (graft synthetic-corpus vocab)" +:
      merges.result().map { case (a, b) => s"$a $b" }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outPath).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    println(s"wrote ${merges.result().length} merges to $outPath")
  }
}
