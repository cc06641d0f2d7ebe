package graft.tools

import org.apache.spark.sql.functions._
import graft.oracle.GeoDerive._

/** Test-scope profiler for the q47-vs-q10 overhead gap (VERDICT r6 #2):
  * times each run of the auto-shift kNN separately and checks whether
  * the density-shift memo actually hits across invocations. */
object KnnProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    def q(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name: $s%.3f s")
      s
    }
    // warm both paths once
    q("q10_knn"); q("q47_knn_auto")
    // timed, alternating
    (0 until 3).foreach { _ => q("q10_knn"); q("q47_knn_auto") }

    def pts = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
      expr(s"(${x32Sql("l_orderkey", "l_linenumber")}) >> 8").as("x"),
      expr(s"(${y32Sql("l_orderkey", "l_partkey")}) >> 8").as("y"))
    val e1 = pts; val e2 = pts
    println(s"semanticHash stable: ${e1.queryExecution.analyzed.semanticHash() == e2.queryExecution.analyzed.semanticHash()}")

    val t1 = System.nanoTime()
    val shift = graft.join.Knn.autoTileShift(e1, k = 5)
    println(f"autoTileShift: $shift (first call ${(System.nanoTime() - t1) / 1e9}%.3f s)")
    val t2 = System.nanoTime()
    graft.join.Knn.autoTileShift(e2, k = 5)
    println(f"autoTileShift again (memo?): ${(System.nanoTime() - t2) / 1e9}%.3f s")

    val qs = spark.read.parquet(s"$sfDir/supplier.parquet")
      .filter(col("s_suppkey") < 10)
      .select(col("s_suppkey").as("qid"),
        expr(s"(${x32Sql("s_suppkey", "s_suppkey * 3 + 1")}) >> 8").as("qx"),
        expr(s"(${y32Sql("s_suppkey", "s_suppkey * 5 + 2")}) >> 8").as("qy"))
    Seq(shift, shift + 1, shift + 2, 19).distinct.foreach { sh =>
      val (_, fb) = graft.join.Knn.knnJoinWithStats(spark, e1, qs, k = 5, tileShift = sh)
      println(s"fallback queries at shift=$sh: $fb")
    }
    spark.stop()
  }
}
