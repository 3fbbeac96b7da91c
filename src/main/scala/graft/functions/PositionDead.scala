package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `(file_name, row_position) → row is positionally dead` — the read-side
  * half of the log table's BULK deletion vectors (the Delta/Iceberg
  * roaring-bitmap DV design: scan tasks filter rows by a per-file bitmap
  * of dead positions).
  *
  * The expression itself carries only the SMALL state: the table path and
  * the per-file sidecar NAMES from the manifest fold (`dvp`). The bitmaps
  * are loaded lazily ON THE EXECUTOR, once per (executor, file), from the
  * table's `_dv/` directory and cached in a process-wide map — the driver
  * never holds a bitmap, and a task touches only the sidecars of files it
  * actually reads. That is what keeps a 100 TB table with millions of
  * dead rows plannable: the plan grows O(#vectored files), not O(rows
  * deleted).
  *
  * Codegen-friendly: `doGenCode` emits a direct virtual call on the
  * expression instance (a plan reference object), so the filter stays
  * inside whole-stage codegen — no UDF, no fallback. Both inputs are
  * parquet `_metadata` fields (non-nullable in practice); the standard
  * null-in/null-out contract applies defensively.
  */
case class PositionDead(
    left: Expression, right: Expression,
    table: String, entries: Map[String, Seq[String]])
  extends BinaryExpression {

  // ExpectsInputTypes avoided: its signature names AbstractDataType,
  // private[sql] in Spark 4.1's spark-sql-api (same note as
  // [[LongDotProduct]]). Equivalent check by hand.
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, BIGINT), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_position_dead"

  // loaded-bitmap cache, shared across tasks of one executor JVM and
  // rebuilt per JVM (transient): keyed by file name — sidecars are
  // immutable once referenced, so entries never need invalidation
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.roaringbitmap.longlong.Roaring64Bitmap]()

  /** Executor-side probe; called from generated code. */
  def isDead(file: UTF8String, pos: Long): Boolean = {
    val f = file.toString
    val names = entries.getOrElse(f, null)
    if (names == null) return false
    val bm = cache.computeIfAbsent(f,
      _ => graft.io.LogTable.loadPosDv(table, names))
    bm.contains(pos)
  }

  override protected def nullSafeEval(file: Any, pos: Any): Any =
    isDead(file.asInstanceOf[UTF8String], pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("posDead", this, classOf[PositionDead].getName)
    nullSafeCodeGen(ctx, ev, (f, p) => s"${ev.value} = $ref.isDead($f, $p);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
