package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into Spark 4's `private[sql]` Column↔Expression conversions —
 * the standard pattern for third-party Catalyst extensions (same trick
 * as spark-sedona / frameless): a single object inside the
 * `org.apache.spark.sql` namespace, everything else stays in `graft.*`.
 */
object GraftBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
