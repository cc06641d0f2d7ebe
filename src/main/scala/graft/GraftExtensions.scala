package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * SparkSessionExtensions entry point: registers the engine's native
 * expressions for SQL use in any session built with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")` —
 * no code dependency needed for SQL users. The function table is
 * [[graft.functions.sqlBuilders]], shared with `registerAll` so the
 * two registration paths can never drift.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  override def apply(e: SparkSessionExtensions): Unit =
    graft.functions.sqlBuilders.foreach { case (name, b) =>
      e.injectFunction((FunctionIdentifier(name), info(name), b))
    }
}
