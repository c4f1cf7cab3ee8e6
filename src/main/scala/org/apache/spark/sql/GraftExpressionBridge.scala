package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge to the `private[sql]` Column ⇄ catalyst Expression
  * converters (Spark 4 split Column onto ColumnNode, hiding the old public
  * `new Column(expr)` path). Lives in the spark.sql package solely to
  * satisfy the access modifier — the standard pattern for libraries that
  * ship custom codegen Expressions without a SparkSessionExtensions
  * registration requirement. */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
