// This file lives in org.apache.spark.sql.catalyst.analysis on purpose:
// AssignmentUtils (the alignment engine behind UPDATE/MERGE assignment
// resolution) is private[sql], and a library-side alignment rule needs
// it verbatim — re-implementing column alignment would drift from
// Spark's own semantics. Same precedent as GraftColumnBridge.
package org.apache.spark.sql.catalyst.analysis

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
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

  /** Resolves one expression's attribute references against the UNION of
    * the given plans' outputs as one scope — not plan-by-plan, because
    * precedence matters: `src.src` against (target with a STRING column
    * `src`, source aliased `src`) must resolve as qualifier `src` +
    * column `src`, not as a nested-field extraction on the target's
    * string column, and only a single AttributeSeq applies Spark's
    * qualified-before-nested precedence across both sides. Anything that
    * stays unresolved is left in place so CheckAnalysis reports the
    * standard UNRESOLVED_COLUMN error with suggestions. */
  private def resolveIn(plans: Seq[LogicalPlan])(e: Expression): Expression = {
    val scope: org.apache.spark.sql.catalyst.expressions.AttributeSeq =
      plans.flatMap(_.output)
    e.transformUp {
      case u: UnresolvedAttribute =>
        scope.resolve(u.nameParts, conf.resolver).getOrElse(u)
    }
  }

  /** Fully resolves an unresolved MERGE for a graft-log target.
    *
    * ACCEPT_ANY_SCHEMA sets `skipSchemaResolution`, and Spark's
    * ResolveReferences returns such a MergeIntoTable UNTOUCHED (the
    * connector is presumed to do its own resolution — which Delta does
    * with ResolveDeltaMergeInto, and this is that rule for graft-log).
    * Scoping follows Spark's own MergeResolvePolicy: the merge condition
    * and matched actions see both sides; NOT MATCHED (insert) conditions
    * and values see the source only (keys name target columns); NOT
    * MATCHED BY SOURCE sees the target only. `UPDATE SET *` / `INSERT *`
    * expand by target column name against the source. */
  private def resolveMerge(m: MergeIntoTable): MergeIntoTable = {
    val tgt = m.targetTable
    val src = m.sourceTable
    val both = Seq(tgt, src)

    def starAssignments(valueSide: LogicalPlan): Seq[Assignment] =
      tgt.output.map { a =>
        val v = valueSide.resolve(Seq(a.name), conf.resolver).getOrElse(
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "UNRESOLVED_COLUMN.WITH_SUGGESTION",
            messageParameters = Map(
              "objectName" -> a.name,
              "proposal" -> valueSide.output.map(_.name).mkString(", "))))
        Assignment(a, v)
      }

    def resolveAssignments(
        as: Seq[Assignment], valueScope: Seq[LogicalPlan]): Seq[Assignment] =
      as.map { a =>
        Assignment(
          resolveIn(Seq(tgt))(a.key),
          resolveIn(valueScope)(a.value))
      }

    def resolveAction(condScope: Seq[LogicalPlan], valueScope: Seq[LogicalPlan])(
        action: MergeAction): MergeAction = action match {
      case u: UpdateAction => u.copy(
        condition = u.condition.map(resolveIn(condScope)),
        assignments = resolveAssignments(u.assignments, valueScope))
      case _: UpdateStarAction => UpdateAction(
        action.condition.map(resolveIn(condScope)), starAssignments(src))
      case d: DeleteAction =>
        d.copy(condition = d.condition.map(resolveIn(condScope)))
      case i: InsertAction => i.copy(
        condition = i.condition.map(resolveIn(Seq(src))),
        assignments = resolveAssignments(i.assignments, Seq(src)))
      case _: InsertStarAction => InsertAction(
        action.condition.map(resolveIn(Seq(src))), starAssignments(src))
      case other => other
    }

    m.copy(
      mergeCondition = resolveIn(both)(m.mergeCondition),
      matchedActions = m.matchedActions.map(resolveAction(both, both)),
      notMatchedActions = m.notMatchedActions.map(resolveAction(Seq(src), Seq(src))),
      notMatchedBySourceActions =
        m.notMatchedBySourceActions.map(resolveAction(Seq(tgt), Seq(tgt))))
  }

  /** SQL positional-INSERT resolution: `INSERT INTO t SELECT a, b` is
    * BY POSITION in SQL, and Spark's ResolveOutputRelation — the rule
    * that would project the SELECT list onto the table's columns —
    * skips ACCEPT_ANY_SCHEMA targets entirely. Without this, the write
    * path has only NAMES to go on, and a SELECT alias that happens to
    * coincide with one table column (e.g. `SELECT id AS k, name` into
    * `(k, v)`) would resolve by name: `name` evolving the table as a
    * new column and `v` NULL-filling — silent corruption of a standard
    * SQL idiom. Project positionally here (rename + ANSI cast, exactly
    * what ResolveOutputRelation's byPosition path does) and flip the
    * plan to by-name so every downstream consumer sees aligned columns.
    * Fires only when the arity matches; otherwise the connector's own
    * loud resolution applies. The DataFrame API never takes this path —
    * its writes carry isByName = true. */
  private def positionalProject(
      query: LogicalPlan, tableAttrs: Seq[Attribute]): LogicalPlan =
    Project(query.output.zip(tableAttrs).map { case (in, t) =>
      if (in.dataType == t.dataType && in.name == t.name) in
      else org.apache.spark.sql.catalyst.expressions.Alias(
        org.apache.spark.sql.catalyst.expressions.Cast(
          in, t.dataType, ansiEnabled = true), t.name)()
    }, query)

  /** A positional INSERT whose SELECT arity differs from the table is a
    * SQL error, full stop — without this, an overlong SELECT whose names
    * happen to overlap the table would fall to the by-name write path
    * and silently EVOLVE the schema (or NULL-fill missing columns)
    * instead of raising the column-count mismatch SQL requires. */
  private def requireArity(
      tableName: String, query: LogicalPlan, tableAttrs: Seq[Attribute]): Unit =
    if (query.output.length != tableAttrs.length) {
      // pick the subclass by direction: an overlong SELECT reported as
      // "not enough data columns" sends the user hunting for a missing
      // column they actually have one too many of
      val subclass =
        if (query.output.length > tableAttrs.length) "TOO_MANY_DATA_COLUMNS"
        else "NOT_ENOUGH_DATA_COLUMNS"
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = s"INSERT_COLUMN_ARITY_MISMATCH.$subclass",
        messageParameters = Map(
          "tableName" -> tableName,
          "tableColumns" -> tableAttrs.map(_.name).mkString(", "),
          "dataColumns" -> query.output.map(_.name).mkString(", ")))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case a: AppendData
        if !a.isByName && a.query.resolved && a.table.resolved &&
          isGraftLog(a.table) =>
      requireArity(a.table.name, a.query, a.table.output)
      a.copy(query = positionalProject(a.query, a.table.output), isByName = true)
    case o: OverwriteByExpression
        if !o.isByName && o.query.resolved && o.table.resolved &&
          isGraftLog(o.table) =>
      requireArity(o.table.name, o.query, o.table.output)
      o.copy(query = positionalProject(o.query, o.table.output), isByName = true)
    // Phase 1: resolution. Spark's ResolveReferences skips MERGE targets
    // whose (fully alias-stripped) relation declares ACCEPT_ANY_SCHEMA,
    // so for graft-log targets the condition/actions would never resolve
    // and analysis would fail with UNRESOLVED_COLUMN — resolve them here
    // instead. Once resolved, the alignment cases below fire on the next
    // fixed-point iteration.
    //
    // Deliberately NOT gated on `m.skipSchemaResolution`: in Spark 4.1
    // that node-level flag strips only ONE SubqueryAlias layer, so
    // `MERGE INTO cat.ns.t AS tgt` (two layers: user alias over the
    // catalog-name alias) computes false — while ResolveReferences'
    // own gate uses EliminateSubqueryAliases and still skips. Keying on
    // isGraftLog (which fully strips) is the consistent test.
    case m: MergeIntoTable
        if !m.resolved && m.childrenResolved && isGraftLog(m.targetTable) =>
      resolveMerge(m)
    case u: UpdateTable
        if u.resolved && u.rewritable && !u.aligned && isGraftLog(u.table) =>
      // same flags Spark's own rule passes (nested-type coercion off)
      u.copy(assignments = AssignmentUtils.alignUpdateAssignments(
        u.table.output, u.assignments, false, false))
    case m: MergeIntoTable
        if m.resolved && m.rewritable && !m.aligned && isGraftLog(m.targetTable) =>
      m.copy(
        matchedActions = alignActions(m.targetTable.output, m.matchedActions),
        notMatchedActions = alignActions(m.targetTable.output, m.notMatchedActions),
        notMatchedBySourceActions =
          alignActions(m.targetTable.output, m.notMatchedBySourceActions))
  }
}
