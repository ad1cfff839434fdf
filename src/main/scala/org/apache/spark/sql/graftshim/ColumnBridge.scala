package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * The one `private[sql]` doorway graft needs: Column ⇄ Expression.
 * Spark 4 wraps Columns around ColumnNodes and keeps the classic
 * Expression bridge (`ExpressionUtils`) package-private, so a library
 * shipping its own codegen'd Catalyst expressions
 * ([[graft.functions.ArrayDot]]) must host this two-liner inside the
 * `org.apache.spark.sql` namespace. No other Spark internals are touched.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Runtime registration of a graft expression on an EXISTING session
    * (the session-build-time path is [[graft.functions.GraftExtensions]];
    * this one serves sessions graft didn't construct, e.g. a host
    * application's). `sessionState` is private[sql] — same doorway. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
