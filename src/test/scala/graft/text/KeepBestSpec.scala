package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** keepBestPerCluster: exactly one kept=1 per cluster — the max-score
  * member with min-doc_id tie-break — verified against a brute-force
  * reduction on clusters with ties, singletons, and one hot cluster. */
class KeepBestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val labels = rows.map(r => (r._1, r._2)).toDF("doc_id", "rep")
    val scores = rows.map(r => (r._1, r._3)).toDF("doc_id", "score")
    TextOps.keepBestPerCluster(labels, scores)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  private def brute(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long, Long)] = {
    val bestBy = rows.groupBy(_._2).map { case (rep, g) =>
      rep -> g.minBy(r => (-r._3, r._1))._1
    }
    rows.map(r => (r._1, r._2, r._3, if (bestBy(r._2) == r._1) 1L else 0L)).toSet
  }

  test("ties, singletons, and a hot cluster (vs brute force)") {
    val rnd = new scala.util.Random(7)
    // cluster 0: 2000 members with scores from a SMALL range (ties
    // guaranteed, so the min-doc_id tie-break is exercised); clusters
    // 1..50: ~8 members; 500..520: singletons
    val rows =
      (0 until 2000).map(i => (i.toLong, 0L, rnd.nextInt(5).toLong)) ++
      (0 until 400).map(i => (10000L + i, 1L + i % 50, rnd.nextInt(100).toLong)) ++
      (0 until 21).map(i => (20000L + i, 500L + i, rnd.nextInt(100).toLong))
    val got = run(rows)
    assert(got == brute(rows))
    // exactly one kept per cluster
    val perCluster = got.groupBy(_._2).map { case (rep, g) => rep -> g.count(_._4 == 1L) }
    assert(perCluster.values.forall(_ == 1), perCluster.filter(_._2 != 1))
  }

  test("partially scored clusters: unscored members stay, lose the argmax; fully unscored clusters keep min doc_id") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)).toDF("doc_id", "rep")
    // doc 2 unscored in a scored cluster; cluster 3 fully unscored
    val scores = Seq((1L, 10L)).toDF("doc_id", "score")
    val got = TextOps.keepBestPerCluster(labels, scores)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3))).toSet
    assert(got == Set((1L, Some(10L), 1L), (2L, None, 0L), (3L, None, 1L), (4L, None, 0L)),
      s"got $got")
  }
}
