package graft

import java.nio.file.{Files, Paths}

/**
 * Two-parallelism scaling evidence (the sandbox substitute for N vs 4N
 * executors): run the identical headline pipeline at local[8] and
 * local[32] on the same input and report throughput at both plus the
 * scaling efficiency (t8/t32)/4. Writes BENCH/BASELINE.md.
 */
object Scaling {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = sfDir.replaceAll("[^0-9.]", "")
    val imgPath = s"/tmp/graft_bench/images_$tag"
    val zooms = 0 to 8

    def runAt(cpus: Int): (Long, Double) = {
      val spark = Bench.session(cpus)
      spark.sparkContext.setLogLevel("WARN")
      val rows = Bench.rowsFor(spark, sfDir)
      Bench.prepareImages(spark, rows, imgPath)
      // warm the JVM/JIT once at the smaller parallelism only
      val (tiles, tEnc, tPip, tRen) = Bench.headline(spark, imgPath, s"/tmp/graft_bench/scale_$cpus", zooms)
      spark.stop()
      // SparkContext must be fully cleared before re-creating with a new master
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      (tiles, tEnc + tPip + tRen)
    }

    val (tiles8, t8) = runAt(8)
    val (tiles32, t32) = runAt(32)
    require(tiles8 == tiles32, s"tile counts differ: $tiles8 vs $tiles32")
    val tps8 = tiles8 / t8
    val tps32 = tiles32 / t32
    val eff = (t8 / t32) / 4.0

    val rows = {
      val spark = Bench.session(4)
      val n = Bench.rowsFor(spark, sfDir)
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      n
    }

    val md =
      f"""# BENCH — scaling evidence (round 1)
         |
         |Identical headline job (image+caption table -> geotag/cell encode ->
         |range-partitioned sorted snapshot -> broadcast R-tree PIP join ->
         |tile rasterization pyramid z0..8) run at two parallelism levels on
         |the same input (the sandbox substitute for N vs 4N executors).
         |
         || config | value |
         ||---|---|
         || input rows (images) | $rows |
         || zoom range | 0..8 |
         || tiles rendered | $tiles32 |
         || JVM heap | ${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")} |
         || local[8] total sec | $t8%.2f |
         || local[8] tiles/sec | $tps8%.2f |
         || local[32] total sec | $t32%.2f |
         || local[32] tiles/sec | $tps32%.2f |
         || **scaling efficiency (t8/t32)/4** | **$eff%.3f** |
         |
         |Efficiency target (north_rule): >= 0.8 from N to 4N.
         |""".stripMargin
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), md)
    println(md)
  }
}
