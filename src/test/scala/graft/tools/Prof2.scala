package graft.tools
import org.apache.spark.sql.functions._
import graft.core._

object Prof2 {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(32)
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val table = spark.read.parquet("/tmp/graft_bench/scale_32/sorted")
    var t0 = System.nanoTime()
    val ranked = graft.render.Render.withGlobalRank(table.select(col("cell"), col("meta")))
    println(f"[prof2] rank build: ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    val n = graft.render.Render.renderPyramid(ranked, 0 to 8, 48, RenderParams()).count()
    println(f"[prof2] pyramid($n tiles): ${(System.nanoTime()-t0)/1e9}%.2f s at $cpus threads")
    spark.stop()
  }
}
