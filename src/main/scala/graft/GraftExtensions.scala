package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types.LongType
import graft.functions.{CellEncodeExpr, CellXExpr, CellYExpr, DotProductExpr}

/**
 * SparkSessionExtensions entry point: registers the engine's native
 * expressions for SQL use in any session built with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")` —
 * no code dependency needed for SQL users.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("cell_encode"), info("cell_encode"),
      (es: Seq[Expression]) => CellEncodeExpr(Cast(es(0), LongType), Cast(es(1), LongType))))
    e.injectFunction((FunctionIdentifier("cell_x"), info("cell_x"),
      (es: Seq[Expression]) => CellXExpr(Cast(es.head, LongType))))
    e.injectFunction((FunctionIdentifier("cell_y"), info("cell_y"),
      (es: Seq[Expression]) => CellYExpr(Cast(es.head, LongType))))
    e.injectFunction((FunctionIdentifier("dot_ff"), info("dot_ff"),
      (es: Seq[Expression]) => DotProductExpr(es(0), es(1))))
  }
}
