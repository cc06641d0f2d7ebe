package graft.tools

/** Test-scope: time named SparkEntry queries at a given sf dir.
  * Usage: Test/runMain graft.tools.QProfile <sfDir> q51_dup_spans [q48...] */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val names = args.drop(1)
    // warm once, then two timed passes each
    names.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir).count())
    (0 until 2).foreach { _ =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
