package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression bridge.
  *
  * Spark 4 moved `Column` to the `sql-api` module: it wraps a
  * `ColumnNode`, and the classic converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`.
  * The Delta copy-on-write writers need exactly one capability those
  * converters provide: splitting a caller's predicate `Column` into
  * top-level AND conjuncts and rebuilding the partition-only subset —
  * the partition-pruning lever a DELETE/MERGE match scan answers from
  * log metadata. This object is the narrowest possible opening: two
  * one-line delegates, no other internals touched. The same technique
  * (a shim compiled into `org.apache.spark.sql`) is what public Spark
  * extension libraries use for the identical need.
  */
object GraftColumnBridge {
  /** The Catalyst expression a `Column` resolves to. */
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Wrap a Catalyst expression back into a `Column`. */
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
