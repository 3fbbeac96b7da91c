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

  // L1: per-instance, keyed by the file name the row already carries —
  // the PER-ROW lookup must not rebuild the (table, sidecar-set) string
  // key (a sort + concat per scanned row). @transient: rebuilt per task
  // deserialization, but it only caches POINTERS into the JVM-global L2,
  // so the sidecar IO still happens once per (executor, sidecar set).
  @transient private lazy val l1 =
    new java.util.concurrent.ConcurrentHashMap[
      String, org.roaringbitmap.longlong.Roaring64Bitmap]()

  /** Executor-side probe; called from generated code. */
  def isDead(file: UTF8String, pos: Long): Boolean = {
    val f = file.toString
    val names = entries.getOrElse(f, null)
    if (names == null) return false
    var bm = l1.get(f)
    if (bm == null) {
      bm = PositionDead.mergedBitmap(table, names)
      l1.put(f, bm)
    }
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

object PositionDead {
  /** JVM-global merged-bitmap cache (L2). It must live HERE, not on the
    * expression instance: each task deserializes its own copy of the
    * plan's reference objects, so per-instance state would re-read and
    * re-deserialize the sidecars once per task — on a wide scan that is
    * O(tasks) sidecar IO instead of the intended once per (executor,
    * sidecar set). Keyed by (table, sidecar-name set): sidecars are
    * immutable once referenced (a later delete mints NEW names → a new
    * key), so entries never need invalidation. Bounded by BYTES, not
    * entry count — merged bitmaps of bulk deletes run to megabytes
    * each, and a long-lived executor serving many DV tables must not
    * retain unbounded heap for a cache whose misses merely re-read a
    * sidecar file. The coarse clear-on-cap is correct for the same
    * immutability reason; live references held by in-flight tasks' L1
    * maps stay valid (the clear drops the MAP entries, not the
    * bitmaps). */
  private def cacheMaxBytes: Long =
    sys.props.get("graft.dv.cacheMaxBytes").map(_.toLong)
      .getOrElse(256L * 1024 * 1024)
  private val cachedBytes = new java.util.concurrent.atomic.AtomicLong()
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, org.roaringbitmap.longlong.Roaring64Bitmap]()

  private[functions] def mergedBitmap(
      table: String,
      names: Seq[String]): org.roaringbitmap.longlong.Roaring64Bitmap = {
    // fast path lock-free; the load path is SERIALIZED so the cap clear
    // cannot interleave with an insert's byte accounting (a concurrent
    // insert landing in an already-swept bin would survive the clear
    // while set(0) wiped its bytes — permanently untracked heap, the
    // exact condition the cap exists to prevent). Loads are rare (once
    // per (executor, sidecar set)), so the lock costs nothing per row.
    val key = table + "\u0000" + names.sorted.mkString("\u0000")
    val hit = cache.get(key)
    if (hit != null) return hit
    synchronized {
      if (cachedBytes.get() > cacheMaxBytes) {
        cache.clear()
        cachedBytes.set(0L)
      }
      cache.computeIfAbsent(
        key,
        _ => {
          val bm = graft.io.LogTable.loadPosDv(table, names)
          cachedBytes.addAndGet(bm.getLongSizeInBytes)
          bm
        })
    }
  }
}
