package graft.tools
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(8)
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, d).count()
      println(f"[qtime] $q: ${(System.nanoTime()-t0)/1e9}%.1f s ($n rows)")
    }
    spark.stop()
  }
}
