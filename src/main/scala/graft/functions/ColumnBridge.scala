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

  /** Hash-set membership against a driver-collected Long set, as the
    * optimizer's own `InSet` predicate: O(1) per probe where an
    * `array_contains(lit(arr), e)` literal probe is O(|set|) per row.
    * The collected-regime rebuilds in [[graft.ext.Corpus]] probe every
    * line/gram of the corpus against a frequent set measured in the
    * thousands — a linear literal scan there multiplies to ~1e9
    * comparisons per pass, all avoidable. Safe inside higher-order
    * lambdas (the analyzer binds the lambda variable through any
    * expression, and `InSet.eval` is a set probe either way). */
  def inLongSet(c: Column, values: Iterable[Long]): Column =
    if (values.isEmpty) org.apache.spark.sql.functions.lit(false)
    else column(org.apache.spark.sql.catalyst.expressions.InSet(
      expression(c), values.map(java.lang.Long.valueOf(_): Any).toSet))

  /** Test-visibility accessor for rules registered on a
    * SparkSessionExtensions instance (private[sql] upstream). */
  def optimizerRules(
      ext: SparkSessionExtensions,
      session: SparkSession): Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(session)
}
