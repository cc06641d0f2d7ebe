package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** stratifiedCap: the salted two-phase top-N must equal the plain
  * per-stratum N-smallest on adversarial shapes — one giant hot stratum
  * (the skew case the salting exists for), many tiny strata, strata
  * smaller than the cap, and hash ties. */
class StratifiedCapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def brute(rows: Seq[(Long, Long, Long)], n: Int): Set[(Long, Long, Long)] =
    rows.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy(r => (r._3, r._1)).take(n)
    }.toSet

  private def run(rows: Seq[(Long, Long, Long)], n: Int, salts: Int): Set[(Long, Long, Long)] = {
    import spark.implicits._
    TextOps.stratifiedCap(rows.toDF("id", "stratum", "h"), "stratum", "h", "id", n, salts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("hot stratum, tiny strata, under-cap strata, and ties (vs brute force)") {
    val rnd = new scala.util.Random(99)
    // stratum 0: 3000 rows (hot); strata 1..30: ~20 rows; strata 40..44:
    // 3 rows (< cap); hashes drawn from a SMALL range so ties are common
    val rows =
      (0 until 3000).map(i => (i.toLong, 0L, rnd.nextInt(50).toLong)) ++
      (0 until 600).map(i => (10000L + i, 1L + i % 30, rnd.nextInt(50).toLong)) ++
      (0 until 15).map(i => (20000L + i, 40L + i % 5, rnd.nextInt(50).toLong))
    for (n <- Seq(1, 7, 25); salts <- Seq(1, 4, 32)) {
      assert(run(rows, n, salts) == brute(rows, n), s"n=$n salts=$salts")
    }
  }
}
