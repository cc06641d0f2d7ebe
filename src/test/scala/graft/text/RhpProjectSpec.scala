package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Random projection: the codegen kernel must equal the brute-force
  * comp() fold exactly, and its sign bits must equal the packed LSH
  * signature (the projection IS what the signature quantizes). */
class RhpProjectSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("kernel == brute force; signs == signature bits") {
    import spark.implicits._
    val r = new scala.util.Random(11)
    val dim = 24
    val vecs = (0 until 40).map(id =>
      (id.toLong, Array.fill(dim)(r.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val planes = 8
    val got = df.select(col("vec_id"),
        graft.ann.Ann.randomProjection(col("embedding"), planes).as("proj"),
        graft.ann.Ann.rhpSignature(col("embedding"), planes).as("sig"))
      .as[(Long, Array[Double], Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    for ((id, v) <- vecs) {
      val expect = Array.tabulate(planes) { p =>
        var s = 0.0
        var i = 0
        while (i < dim) { s += v(i).toDouble * RhpSig.comp(p, i); i += 1 }
        s
      }
      val (proj, sig) = got(id)
      assert(proj.toSeq == expect.toSeq, s"vec $id projections")
      val sigFromProj = proj.zipWithIndex
        .foldLeft(0L) { case (acc, (s, p)) => if (s >= 0) acc | (1L << p) else acc }
      assert(sigFromProj == sig, s"vec $id sign bits")
    }
  }
}
