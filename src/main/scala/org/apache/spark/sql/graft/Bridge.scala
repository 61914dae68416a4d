package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for custom Catalyst expressions.
  * `ExpressionUtils` is `private[sql]`, so the accessor lives in the sql
  * package hierarchy; everything else in graft uses this one indirection.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register named SQL functions on a LIVE session — the runtime twin
    * of SparkSessionExtensions.injectFunction, which only applies at
    * session build time (spark.sql.extensions is a static conf). */
  def registerFunctions(
      spark: org.apache.spark.sql.SparkSession,
      fns: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)]): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    fns.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
