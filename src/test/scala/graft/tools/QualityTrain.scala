package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-shot trainer for the model-based quality filter fixture
 * (graft.text.QualityModel): a deterministic AVERAGED PERCEPTRON over
 * hashed token-bucket counts, quantized to int8 weights.
 *
 * Labeled data is built from the synthetic corpus itself: each document
 * is a positive; its affine-substitution-ciphered corruption (every
 * letter mapped through c -> (c*7 + 3) mod 26, a bijection — token
 * lengths, spacing and digits preserved, vocabulary destroyed) is the
 * matching hard negative. That is exactly the lexical separation a
 * trained quality model is FOR: same shape statistics, wrong words —
 * invisible to the q24 length/punct heuristic.
 *
 * Deterministic: fixed document order (doc_id), fixed epochs, integer
 * feature counts — re-running on the same corpus reproduces the fixture
 * byte-exactly. Prints quantized train accuracy and refuses to write a
 * fixture that separates worse than 99%.
 *
 * Usage: sbt "Test/runMain graft.tools.QualityTrain /root/testdata/sf0.01
 *              src/main/resources/graft/quality_weights.txt"
 */
object QualityTrain {
  final val B = graft.text.QualityModel.Buckets

  def cipher(text: String): String = text.map { ch =>
    if (ch >= 'a' && ch <= 'z') ('a' + ((ch - 'a') * 7 + 3) % 26).toChar
    else if (ch >= 'A' && ch <= 'Z') ('A' + ((ch - 'A') * 7 + 3) % 26).toChar
    else ch
  }

  def features(text: String): Array[Int] = {
    val hs = graft.text.PortableHash.tokenShingleHashes(UTF8String.fromString(text), 1)
    val f = new Array[Int](B)
    var i = 0
    while (i < hs.numElements()) { f((hs.getLong(i) % B).toInt) += 1; i += 1 }
    f
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .appName("quality-train").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    spark.stop()

    // (features, label) pairs: positive corpus doc, negative cipher twin
    val data = docs.flatMap { case (_, t) =>
      Seq((features(t), 1), (features(cipher(t)), -1))
    }

    // averaged perceptron, fixed pass order
    val w = new Array[Double](B + 1) // last = bias
    val acc = new Array[Double](B + 1)
    var t = 1L
    (0 until 10).foreach { _ =>
      data.foreach { case (f, y) =>
        var s = w(B)
        var i = 0
        while (i < B) { s += w(i) * f(i); i += 1 }
        if (y * s <= 0) {
          i = 0
          while (i < B) {
            w(i) += y * f(i); acc(i) += t * y * f(i); i += 1
          }
          w(B) += y; acc(B) += t * y
        }
        t += 1
      }
    }
    val avg = w.indices.map(i => w(i) - acc(i) / t).toArray

    // int8 quantization (scale by max |w| over the weight part; the bias
    // shares the scale so the margin sign is preserved proportionally)
    val maxAbs = math.max(avg.map(math.abs).max, 1e-9)
    val q = avg.map(v => math.round(v * 127.0 / maxAbs))
    val bias = q(B)

    // quantized train accuracy (the fixture as it will actually run)
    val correct = data.count { case (f, y) =>
      var s = bias.toDouble
      var i = 0
      while (i < B) { s += q(i) * f(i); i += 1 }
      (if (s >= 0) 1 else -1) == y
    }
    val accPct = correct.toDouble / data.length
    println(f"quantized train accuracy: $accPct%.4f over ${data.length} examples, bias=$bias")
    require(accPct >= 0.99, f"fixture separates only $accPct%.4f — not writing")

    val sb = new StringBuilder(s"bias $bias\n")
    (0 until B).foreach(i => sb.append(s"$i ${q(i)}\n"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), sb.result())
    println(s"wrote $outPath")
  }
}
