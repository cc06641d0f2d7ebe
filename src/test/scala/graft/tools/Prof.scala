package graft.tools
import org.apache.spark.sql.functions._
import graft.core._

object Prof {
  def main(args: Array[String]): Unit = {
    // 1. PNG encode microbench
    val rgba = Array.tabulate[Byte](256*256*4)(i => (i*31).toByte)
    var t0 = System.nanoTime()
    var i = 0
    while (i < 200) { Png.encode(rgba, 256, 256); i += 1 }
    println(f"png encode: ${(System.nanoTime()-t0)/1e6/200}%.2f ms/tile")
    // 2. canvas + tonemap microbench
    t0 = System.nanoTime()
    i = 0
    while (i < 200) {
      val c = new Canvas(256, 256)
      var j = 0
      while (j < 100) { c.drawPixel(j % 256, (j*7) % 256, 0.1, -1); j += 1 }
      ToneMap(c, RenderParams())
      i += 1
    }
    println(f"canvas+tonemap: ${(System.nanoTime()-t0)/1e6/200}%.2f ms/tile")
    // 3. renderPyramid timing breakdown
    val spark = graft.Bench.session(8)
    spark.sparkContext.setLogLevel("WARN")
    val table = spark.read.parquet("/tmp/graft_bench/work_0.01/sorted")
    t0 = System.nanoTime()
    val ranked = graft.render.Render.withGlobalRank(table.select(col("cell"), col("meta")))
    ranked.count()
    println(f"rank: ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    val n = graft.render.Render.renderPyramid(ranked, 0 to 8, 48, RenderParams()).count()
    println(f"pyramid($n tiles): ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    val n2 = graft.render.Render.renderPyramid(ranked, 0 to 8, 48, RenderParams()).count()
    println(f"pyramid2($n2 tiles): ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
