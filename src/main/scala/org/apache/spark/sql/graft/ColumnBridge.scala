package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression conversions — the
  * standard pattern for Spark extension libraries that compose custom
  * Catalyst aggregates into DataFrame operations (the public `functions._`
  * surface has no constructor for a Column over a caller-built
  * AggregateExpression). Lives in an `org.apache.spark.sql` subpackage
  * solely to satisfy the access modifier; contains no Spark-internal logic. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The session's stable unique id (`private[sql]` on SparkSession) — a
    * memo key that, unlike `System.identityHashCode`, can never alias two
    * sessions (identity hashes are reusable after GC). */
  def sessionUUID(spark: org.apache.spark.sql.SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
}
