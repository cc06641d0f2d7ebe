package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Native Catalyst expressions for the engine's cell-id codec so the
 * encode path stays inside whole-stage codegen (a static call to the
 * pure-JVM kernel — no UDF boxing, no codegen fallback).
 *
 * Semantics: graft.core.Cell (order-comparable Morton ids over zoom-32
 * world coordinates; reference bit layout util.c:64-85).
 */
case class CellEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cell_encode"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    graft.core.Cell.encode(x.asInstanceOf[Long].toInt, y.asInstanceOf[Long].toInt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.core.Cell.encode((int)$x, (int)$y)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class CellXExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cell_x"
  override protected def nullSafeEval(c: Any): Any =
    graft.core.Cell.decodeX(c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Cell.decodeX($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class CellYExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cell_y"
  override protected def nullSafeEval(c: Any): Any =
    graft.core.Cell.decodeY(c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.Cell.decodeY($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
