package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column<->Expression converters so the
  * engine can expose native Catalyst expressions as Columns (same
  * mechanism Spark's own function registry uses). */
object Bridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** [[org.apache.spark.sql.types.AbstractDataType]] is private[sql];
    * alias it so the engine's expressions can declare ExpectsInputTypes
    * inputTypes (analysis-time type checking) from graft packages. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** TypeCollection is private[sql] too. */
  def oneOf(ts: org.apache.spark.sql.types.AbstractDataType*): AbstractType =
    org.apache.spark.sql.types.TypeCollection(ts: _*)
}
