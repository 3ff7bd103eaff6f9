package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(expr)/Column.expr constructors;
  * the supported conversion lives in the sql-private ExpressionUtils.
  * This bridge (in an org.apache.spark.sql subpackage, the standard
  * extension-library technique) re-exposes exactly the two
  * conversions custom Expressions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
