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

/** Native float-array dot product accumulated in doubles left-to-right —
  * bitwise identical to the sequential fold the DuckDB oracle uses, but
  * codegen'd (the higher-order-function fold is interpreted and ~50x
  * slower on the ANN hot path). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "dot_ff"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var sum = 0.0
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double sum = 0.0;
         |for (int i = 0; i < n; i++) {
         |  sum += ((double) $a.getFloat(i)) * ((double) $b.getFloat(i));
         |}
         |${ev.value} = sum;
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
