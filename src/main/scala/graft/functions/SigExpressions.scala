package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd signature expressions for the near-dup / ANN pipelines.
 * The interpreted higher-order-function formulations (transform +
 * aggregate per permutation/bit/plane) dominate runtime at scale; these
 * compute the whole signature in one static-kernel call per row while
 * staying inside whole-stage codegen. Semantics live in
 * graft.text.PortableHash / graft.text.RhpSig, the single source shared
 * with the DuckDB oracle SQL generators.
 */
case class MinhashSigExpr(child: Expression, shingle: Int, perms: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.PortableHash.minhashSig(t.asInstanceOf[UTF8String], shingle, perms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.text.PortableHash.minhashSig($t, $shingle, $perms)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused minhash signature + LSH band keys (array of `bands` keys). */
case class MinhashBandsExpr(child: Expression, shingle: Int, bands: Int, rows: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.PortableHash.minhashBands(t.asInstanceOf[UTF8String], shingle, bands, rows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.text.PortableHash.minhashBands($t, $shingle, $bands, $rows)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimhashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash62"
  override protected def nullSafeEval(t: Any): Any =
    graft.text.PortableHash.simhash62(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.text.PortableHash.simhash62($t)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane sign-bit signature of a float-array embedding. */
case class RhpSigExpr(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rhp_sig"
  override protected def nullSafeEval(v: Any): Any =
    graft.text.RhpSig.signature(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.text.RhpSig.signature($v, $planes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
