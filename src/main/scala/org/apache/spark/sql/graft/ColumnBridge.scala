package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionColumnNode

/** Bridge for exposing native Catalyst expressions as plain Columns without
  * requiring function registration (Spark 4 made Column wrap ColumnNode and
  * the converters private[sql], hence this package location — the standard
  * interop shim shape used by Spark-ecosystem libraries).
  */
object ColumnBridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
