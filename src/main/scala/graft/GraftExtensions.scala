package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.types.LongType
import graft.functions.{CellEncodeExpr, CellXExpr, CellYExpr, DotProductExpr,
  GeotagCellExpr, GeotagLatExpr, GeotagLonExpr,
  MinhashSigExpr, MinhashBandsExpr, SimhashExpr, RhpSigExpr}
import org.apache.spark.sql.catalyst.expressions.{IntegerLiteral, Literal}

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
    e.injectFunction((FunctionIdentifier("geotag_lat"), info("geotag_lat"),
      (es: Seq[Expression]) => GeotagLatExpr(Cast(es.head, LongType))))
    e.injectFunction((FunctionIdentifier("geotag_lon"), info("geotag_lon"),
      (es: Seq[Expression]) => GeotagLonExpr(Cast(es.head, LongType))))
    e.injectFunction((FunctionIdentifier("geotag_cell"), info("geotag_cell"),
      (es: Seq[Expression]) => GeotagCellExpr(Cast(es.head, LongType))))
    // signature kernels: trailing args must be integer literals (they
    // parameterize the generated kernel, not per-row values)
    def intLit(e: Expression, what: String): Int = e match {
      case IntegerLiteral(v) => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
    }
    e.injectFunction((FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      (es: Seq[Expression]) => MinhashSigExpr(es(0), intLit(es(1), "shingle"), intLit(es(2), "perms"))))
    e.injectFunction((FunctionIdentifier("minhash_bands"), info("minhash_bands"),
      (es: Seq[Expression]) => MinhashBandsExpr(es(0), intLit(es(1), "shingle"),
        intLit(es(2), "bands"), intLit(es(3), "rows"))))
    e.injectFunction((FunctionIdentifier("simhash62"), info("simhash62"),
      (es: Seq[Expression]) => SimhashExpr(es.head)))
    e.injectFunction((FunctionIdentifier("rhp_sig"), info("rhp_sig"),
      (es: Seq[Expression]) => RhpSigExpr(es(0), intLit(es(1), "planes"))))
  }
}
