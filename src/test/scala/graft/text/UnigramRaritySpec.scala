package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** unigramRarity vs a brute-force replica: repeated tokens, zero-token
  * docs (must keep a 0/0 row), cap saturation, and the exact integer
  * division semantics. */
class UnigramRaritySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def brute(docsSeq: Seq[(Long, String)], cap: Long): Map[Long, (Long, Long)] = {
    val toks = docsSeq.map { case (id, t) => id -> t.split(" ", -1).filter(_.nonEmpty).toSeq }
    val cnt = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = cnt.values.sum
    toks.map { case (id, ts) =>
      id -> (ts.size.toLong, ts.map(t => math.min(total / cnt(t), cap)).sum)
    }.toMap
  }

  test("rarity matches brute force incl. empty docs and cap saturation") {
    import spark.implicits._
    val docsSeq = Seq(
      1L -> "the the the cat sat",
      2L -> "the dog sat on mat",
      3L -> "",              // zero tokens -> (0, 0) row must survive
      4L -> "   ",           // whitespace only
      5L -> "unique zebra",  // hapax tokens -> saturate small caps
      6L -> "the the the the the the")
    for (cap <- Seq(1L, 3L, 1L << 20)) {
      val got = TextOps.unigramRarity(docsSeq.toDF("doc_id", "text"), cap)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == brute(docsSeq, cap), s"cap=$cap")
    }
  }
}
