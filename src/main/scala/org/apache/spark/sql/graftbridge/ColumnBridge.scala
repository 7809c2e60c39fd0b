package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 unified the Column API over ColumnNode and made the classic
  * Expression conversions `private[sql]`; extension libraries shipping
  * native expressions need exactly these two conversions, so we surface
  * them from an `org.apache.spark.sql` subpackage (the standard pattern
  * for Spark-native extension libraries).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply an extensions installer's injected FUNCTIONS to an already
    * running session (the standard `withExtensions` route only works at
    * session build time; tests and notebooks attach to live sessions). */
  def registerExtensionFunctions(
      spark: SparkSession, install: SparkSessionExtensions => Unit): Unit = {
    val ext = new SparkSessionExtensions
    install(ext)
    ext.registerFunctions(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry)
  }
}
