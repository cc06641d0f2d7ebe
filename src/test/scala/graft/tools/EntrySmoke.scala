package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(4)
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[entry] rows=$n")
    df.show(3, truncate = false)
    spark.stop()
  }
}
