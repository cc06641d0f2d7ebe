package graft.tools
import org.apache.spark.sql.functions._
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.session(4)
    spark.sparkContext.setLogLevel("WARN")
    val table = spark.read.parquet("/tmp/graft_bench/work_0.01/sorted")
    val ranked = graft.render.Render.withGlobalRank(table.select(col("cell"), col("meta")))
    val tiles = graft.render.Render.renderPyramid(ranked, 0 to 8, 48, graft.core.RenderParams())
    println("=== renderPyramid plan ===")
    println(tiles.queryExecution.executedPlan.toString().take(3000))
    val scan = graft.query.TileOps.tileRangeScan(table, 6, 11, 23)
    println("=== range scan formatted ===")
    println(scan.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(2500))
    spark.stop()
  }
}
