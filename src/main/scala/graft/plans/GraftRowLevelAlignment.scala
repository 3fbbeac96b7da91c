// This file lives in org.apache.spark.sql.catalyst.analysis on purpose:
// AssignmentUtils (the alignment engine behind UPDATE/MERGE assignment
// resolution) is private[sql], and a library-side alignment rule needs
// it verbatim — re-implementing column alignment would drift from
// Spark's own semantics. Same precedent as GraftColumnBridge.
package org.apache.spark.sql.catalyst.analysis

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Restores SQL `UPDATE` / `MERGE INTO` for graft-log tables.
  *
  * The connector declares ACCEPT_ANY_SCHEMA so schema-evolving appends
  * reach [[graft.io.LogTable.append]]'s own validation — but that same
  * capability sets `skipSchemaResolution` on row-level commands, which
  * makes Spark's ResolveRowLevelCommandAssignments skip assignment
  * alignment, which in turn leaves `aligned` false and the
  * RewriteUpdateTable/RewriteMergeIntoTable group-rewrites dormant: the
  * statement falls through to the planner's "does not support UPDATE
  * TABLE" error. (Delta resolves the same tension with its own analysis
  * extension; this is that move at library scale.)
  *
  * This resolution rule (injected by [[graft.plans.GraftExtensions]])
  * performs EXACTLY the alignment Spark's own rule would — the same
  * [[AssignmentUtils]] calls with the same flags — but scoped to
  * graft-log tables and ungated on `skipSchemaResolution`, because the
  * capability's purpose here is append-evolution, not laxer UPDATE
  * semantics: an UPDATE/MERGE assignment set must still resolve against
  * the table's committed columns. Once aligned, Spark's stock rewrites
  * take over and drive the group-based copy-on-write through the
  * connector's row-level operation. */
object GraftRowLevelAlignment extends Rule[LogicalPlan] {

  private def isGraftLog(plan: LogicalPlan): Boolean =
    EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation =>
        r.table.isInstanceOf[graft.sources.v2.LogTableTable]
      case _ => false
    }

  private def alignActions(
      attrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      actions: Seq[MergeAction]): Seq[MergeAction] =
    actions.map {
      case u: UpdateAction => u.copy(assignments =
        AssignmentUtils.alignUpdateAssignments(attrs, u.assignments, false, false))
      case d: DeleteAction => d
      case i: InsertAction => i.copy(assignments =
        AssignmentUtils.alignInsertAssignments(attrs, i.assignments))
      case other => other
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case u: UpdateTable
        if u.skipSchemaResolution && u.resolved && u.rewritable && !u.aligned &&
          isGraftLog(u.table) =>
      // same flags Spark's own rule passes (nested-type coercion off)
      u.copy(assignments = AssignmentUtils.alignUpdateAssignments(
        u.table.output, u.assignments, false, false))
    case m: MergeIntoTable
        if m.skipSchemaResolution && m.resolved && m.rewritable && !m.aligned &&
          isGraftLog(m.targetTable) =>
      m.copy(
        matchedActions = alignActions(m.targetTable.output, m.matchedActions),
        notMatchedActions = alignActions(m.targetTable.output, m.notMatchedActions),
        notMatchedBySourceActions =
          alignActions(m.targetTable.output, m.notMatchedBySourceActions))
  }
}
