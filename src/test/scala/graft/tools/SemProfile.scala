package graft.tools

import org.apache.spark.sql.functions._

/** Test-scope: q64 phase split (kmeans vs pair graph vs components). */
object SemProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // warm
    graft.ann.Ann.semDedup(e, k = 8, iters = 3, minCos = 0.3).count()
    (0 until 2).foreach { _ =>
      val t0 = System.nanoTime()
      val (cids, cvecs) = graft.ann.Ann.kmeansCentroids(e, k = 8, iters = 3)
      val t1 = System.nanoTime()
      val res = graft.ann.Ann.semDedup(e, cids, cvecs, minCos = 0.3)
      val n = res.count()
      val t2 = System.nanoTime()
      println(f"kmeans: ${(t1 - t0) / 1e9}%.3f s, semdedup: ${(t2 - t1) / 1e9}%.3f s ($n rows)")
      val pairs = graft.ann.Ann.semDedupPairsForProfile(e, cids, cvecs, 0.3)
      val t3 = System.nanoTime()
      val np = pairs.count()
      println(f"pairs only: ${(System.nanoTime() - t3) / 1e9}%.3f s ($np pairs)")
    }
    spark.stop()
  }
}
