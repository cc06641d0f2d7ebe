package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, lit, shiftrightunsigned}

/** Column-level API for the engine's spatial functions. */
package object functions {
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  /** (x32, y32) world coords -> order-comparable Morton cell id. */
  def cell_encode(x: Column, y: Column): Column =
    column(CellEncodeExpr(expression(x), expression(y)))

  /** cell id -> world x (unsigned 32-bit widened to Long). */
  def cell_x(c: Column): Column = column(CellXExpr(expression(c)))

  /** cell id -> world y. */
  def cell_y(c: Column): Column = column(CellYExpr(expression(c)))

  /** phash -> deterministic geotag (codegen'd; ImageTable's formula). */
  def geotag_lat(p: Column): Column = column(GeotagLatExpr(expression(p)))
  def geotag_lon(p: Column): Column = column(GeotagLonExpr(expression(p)))
  def geotag_cell(p: Column): Column = column(GeotagCellExpr(expression(p)))

  /** tile x at zoom z containing the cell. */
  def tile_x(c: Column, z: Int): Column =
    if (z == 0) lit(0L) else shiftrightunsigned(cell_x(c), 32 - z)

  def tile_y(c: Column, z: Int): Column =
    if (z == 0) lit(0L) else shiftrightunsigned(cell_y(c), 32 - z)

  /** Register SQL names for the native expressions. */
  def registerAll(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.LongType
    val reg = spark.sessionState.functionRegistry
    // SQL literals may arrive as INT: coerce children to LONG
    reg.createOrReplaceTempFunction("cell_encode",
      es => CellEncodeExpr(Cast(es(0), LongType), Cast(es(1), LongType)), "built-in")
    reg.createOrReplaceTempFunction("cell_x", es => CellXExpr(Cast(es.head, LongType)), "built-in")
    reg.createOrReplaceTempFunction("cell_y", es => CellYExpr(Cast(es.head, LongType)), "built-in")
    reg.createOrReplaceTempFunction("geotag_lat", es => GeotagLatExpr(Cast(es.head, LongType)), "built-in")
    reg.createOrReplaceTempFunction("geotag_lon", es => GeotagLonExpr(Cast(es.head, LongType)), "built-in")
    reg.createOrReplaceTempFunction("geotag_cell", es => GeotagCellExpr(Cast(es.head, LongType)), "built-in")
    reg.createOrReplaceTempFunction("dot_ff", es => DotProductExpr(es(0), es(1)), "built-in")
    def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(s"expected integer literal, got $other")
    }
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinhashSigExpr(es(0), intLit(es(1)), intLit(es(2))), "built-in")
    reg.createOrReplaceTempFunction("minhash_bands",
      es => MinhashBandsExpr(es(0), intLit(es(1)), intLit(es(2)), intLit(es(3))), "built-in")
    reg.createOrReplaceTempFunction("simhash62", es => SimhashExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction("rhp_sig", es => RhpSigExpr(es(0), intLit(es(1))), "built-in")
  }
}
