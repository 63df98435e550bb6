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

  /** Eagerly convert a Column's node tree to a Catalyst expression tree
    * (UnresolvedFunction nodes and all), instead of the lazy
    * `ColumnNodeExpression` wrapper `expression` returns. Function-builder
    * contexts (SparkSessionExtensions.injectFunction) need this form: the
    * analyzer resolves the returned tree's unresolved children in its
    * fixed-point loop, while the lazy wrapper would survive analysis as an
    * unevaluable leaf and fail at codegen.
    */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
