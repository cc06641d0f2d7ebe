package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-shot trainer for the bigram-LM perplexity fixture
 * (graft.text.LmModel): counts hashed bigram buckets over the synthetic
 * corpus, add-one smooths, and quantizes to integer micro-log10 costs.
 *
 * Also derives the CCNet-style head/middle/tail boundaries: the tercile
 * cuts of the per-document AVERAGE bigram cost over the training corpus
 * (integer division, exactly what the runtime computes).
 *
 * Validation before writing: the affine-substitution cipher of each
 * document (QualityTrain.cipher — same shape, garbage vocabulary, so
 * its bigrams land in effectively random buckets) must score a HIGHER
 * average cost than the original for >= 99% of multi-token documents;
 * a bigram LM whose in-domain text doesn't beat noise is broken.
 *
 * Deterministic: fixed document order, integer counts, one log10+round
 * per bucket at train time only (the runtime and oracle read longs).
 *
 * Usage: sbt "Test/runMain graft.tools.LmTrain /root/testdata/sf0.01
 *              src/main/resources/graft/lm_bigram.txt"
 */
object LmTrain {
  import graft.text.LmModel.{Buckets, bucket}

  def bigramBuckets(text: String): Array[Int] = {
    val hs = graft.text.PortableHash.tokenShingleHashes(UTF8String.fromString(text), 1)
    val n = hs.numElements()
    if (n < 2) return Array.empty
    val out = new Array[Int](n - 1)
    var i = 1
    while (i < n) { out(i - 1) = bucket(hs.getLong(i - 1), hs.getLong(i)); i += 1 }
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .appName("lm-train").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).orderBy("doc_id")
      .collect().map(r => r.getString(1))
    spark.stop()

    val counts = new Array[Long](Buckets)
    docs.foreach(t => bigramBuckets(t).foreach(b => counts(b) += 1))
    val total = counts.sum
    require(total > 0, "no bigrams in the training corpus")
    val cost = counts.map(c =>
      math.round(-math.log10((c + 1).toDouble / (total + Buckets)) * 1e6))

    def avgCost(t: String): Option[Long] = {
      val bs = bigramBuckets(t)
      if (bs.isEmpty) None else Some(bs.map(cost(_)).sum / bs.length)
    }

    // tercile boundaries of per-doc average cost on the training corpus
    val avgs = docs.flatMap(avgCost).sorted
    require(avgs.nonEmpty, "no multi-token documents")
    val headMax = avgs((avgs.length - 1) / 3)
    val midMax = avgs(2 * (avgs.length - 1) / 3)

    // separation check: ciphered twin must read as higher-perplexity
    val pairs = docs.flatMap { t =>
      for (o <- avgCost(t); c <- avgCost(QualityTrain.cipher(t))) yield (o, c)
    }
    val sep = pairs.count { case (o, c) => c > o }.toDouble / pairs.length
    println(f"cipher separation: $sep%.4f over ${pairs.length} docs; " +
      f"total bigrams $total; headMax=$headMax midMax=$midMax")
    require(sep >= 0.99, f"LM separates only $sep%.4f — not writing")

    val sb = new StringBuilder(s"headmax $headMax\nmidmax $midMax\n")
    (0 until Buckets).foreach(i => sb.append(s"$i ${cost(i)}\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), sb.result())
    println(s"wrote $outPath")
  }
}
