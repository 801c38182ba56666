/** Bridge into Spark's `private[sql]` Column <-> Expression converters.
  * Spark 4 wraps Column around ColumnNode; the classic converter
  * (org.apache.spark.sql.classic.ExpressionUtils) is package-private, so this
  * one-file shim — placed in the spark.sql package like every Spark extension
  * library does — is the only non-`graft` code in the project.
  */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

package object graftbridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
