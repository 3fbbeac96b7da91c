// This file lives in the org.apache.spark.sql package on purpose: the
// Column <-> catalyst Expression converters (classic.ExpressionUtils) are
// private[sql], and placing the bridge inside the package is the standard
// way for a Spark library to register its own native expressions without
// forking Spark. Nothing else in the engine touches Spark internals.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge used by graft's native Catalyst expressions (e.g.
  * [[graft.functions.LongDotProduct]]) to participate in the public
  * Column API. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test-visibility accessor for rules registered on a
    * SparkSessionExtensions instance (private[sql] upstream). */
  def optimizerRules(
      ext: SparkSessionExtensions,
      session: SparkSession): Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(session)
}
