package graft.sources.v2

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.io.LogTable

/** Maintenance surface as SQL stored procedures (Spark 4's
  * ProcedureCatalog — the Iceberg `CALL catalog.system.proc(...)`
  * idiom), so an operator runs table maintenance from the SQL shell the
  * reference's tooling lives in, no Scala entry point needed:
  *
  * {{{
  *   CALL graftcat.system.compact('etl.orders', 100000)
  *   CALL graftcat.system.vacuum('etl.orders', 3600000)
  *   CALL graftcat.system.truncate_history('etl.orders', 10, 0)
  * }}}
  *
  * Each procedure resolves the dotted table name against the catalog's
  * warehouse, delegates to the ONE [[LogTable]] implementation the
  * Scala API uses, and returns a one-row summary scan. All are
  * non-deterministic (they mutate the log) and re-entrant under the
  * table's own optimistic-commit rules. */
private[v2] object LogProcedures {

  /** One-row result scan for procedure summaries — a [[LocalScan]]
    * (driver-side rows, no job), the one output shape Spark's CALL
    * execution currently accepts. Strings convert to UTF8String here. */
  private final class RowsScan(schema: StructType, resultRows: Seq[Seq[Any]])
      extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = resultRows.map(r =>
      InternalRow.fromSeq(r.map {
        case s: String => UTF8String.fromString(s)
        case v => v
      })).toArray
  }

  private def param(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def paramDefault(name: String, dt: DataType, default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** An UnboundProcedure whose bound form runs `body(args)` and returns
    * the rows it produces under `outSchema`. */
  private def procMulti(
      procName: String, desc: String, params: Array[ProcedureParameter],
      outSchema: StructType)(body: InternalRow => Seq[Seq[Any]]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = desc
        override def parameters(): Array[ProcedureParameter] = params
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] =
          Collections.singletonList(
            new RowsScan(outSchema, body(input)): Scan).iterator()
      }
    }

  /** One-row-summary specialization of [[procMulti]]. */
  private def proc(
      procName: String, desc: String, params: Array[ProcedureParameter],
      outSchema: StructType)(body: InternalRow => Seq[Any]): UnboundProcedure =
    procMulti(procName, desc, params, outSchema)(in => Seq(body(in)))

  /** The procedure set for a catalog rooted at `resolve` (dotted
    * namespace.table → filesystem path; requires the table to exist).
    * `resolveNew` maps a dotted name a procedure CREATES (clone's
    * target) — namespace must exist, the table must not. */
  def forCatalog(
      resolve: String => String,
      resolveNew: String => String): Map[String, UnboundProcedure] = Map(
    "compact" -> proc(
      "compact",
      "Bin-pack a log table's small files (optionally z-ordered); " +
        "semantic no-op, history preserved",
      Array(param("table", StringType), param("target_rows", LongType),
        paramDefault("zorder_by_1", StringType, "NULL"),
        paramDefault("zorder_by_2", StringType, "NULL")),
      new StructType().add("files_before", IntegerType).add("files_after", IntegerType)) { in =>
      val path = resolve(in.getString(0))
      val spark = SparkSession.active
      val key = LogTable.tableKeyCol(path).getOrElse(throw new IllegalArgumentException(
        s"compact: $path predates the key-column property — run one keyed write first"))
      val before = LogTable.read(spark, path).inputFiles.length
      val z = (Option(if (in.isNullAt(2)) null else in.getString(2)),
        Option(if (in.isNullAt(3)) null else in.getString(3))) match {
        case (Some(a), Some(b)) => Some((a, b))
        case (None, None) => None
        case _ => throw new IllegalArgumentException(
          "compact: zorder_by_1 and zorder_by_2 must be given together")
      }
      LogTable.compact(spark, path, key, in.getLong(1), z)
      Seq(before, LogTable.read(spark, path).inputFiles.length)
    },
    "vacuum" -> proc(
      "vacuum",
      "Delete unreferenced data files older than grace_ms (crash orphans, " +
        "truncated-history leftovers)",
      Array(param("table", StringType), paramDefault("grace_ms", LongType, "0")),
      new StructType().add("deleted_files", IntegerType)) { in =>
      Seq(LogTable.vacuum(resolve(in.getString(0)), in.getLong(1)).size)
    },
    "truncate_history" -> proc(
      "truncate_history",
      "Consolidate the snapshot into a checkpoint manifest, keep only the " +
        "last keep_last versions below it, vacuum their files",
      Array(param("table", StringType), param("keep_last", IntegerType),
        paramDefault("grace_ms", LongType, "0")),
      new StructType().add("manifests_dropped", IntegerType)
        .add("files_vacuumed", IntegerType)) { in =>
      val (dropped, vacuumed) = LogTable.truncateHistory(
        resolve(in.getString(0)), in.getInt(1), in.getLong(2))
      Seq(dropped, vacuumed)
    },
    // The CDC feed's SQL surface (the Iceberg create_changelog_view
    // idiom): registers a TEMP VIEW over the DISTRIBUTED changes frame
    // — the procedure result is a one-row summary, never the delta
    // itself, so the driver holds zero change rows however large the
    // version range. `SELECT * FROM <view>` then serves
    // insert/update_preimage-free rows with _change_type, exactly
    // [[LogTable.changes]]'s k13 shape.
    "create_changelog_view" -> proc(
      "create_changelog_view",
      "Register a temp view over the table's change feed between two " +
        "versions (to_version <= 0 means the current head)",
      Array(param("table", StringType), param("from_version", LongType),
        paramDefault("to_version", LongType, "0"),
        paramDefault("view_name", StringType, "NULL")),
      new StructType().add("view_name", StringType)
        .add("from_version", LongType).add("to_version", LongType)) { in =>
      val path = resolve(in.getString(0))
      val spark = SparkSession.active
      val key = LogTable.tableKeyCol(path).getOrElse(throw new IllegalArgumentException(
        s"create_changelog_view: $path predates the key-column property"))
      val fromV = in.getLong(1)
      val toV = if (in.getLong(2) <= 0L) LogTable.version(path) else in.getLong(2)
      val view =
        if (in.isNullAt(3)) s"${in.getString(0).replace('.', '_')}_changes"
        else in.getString(3)
      LogTable.changes(spark, path, key, fromV, toV)
        .createOrReplaceTempView(view)
      Seq(view, fromV, toV)
    },
    // RESTORE (the Delta RESTORE / Iceberg rollback verb) from SQL:
    // contents roll back to the named version as one NEW commit —
    // history intact, the restore itself time-travelable, below-
    // checkpoint versions refused loudly.
    "clone" -> proc(
      "clone",
      "Zero-copy clone of a table's snapshot (optionally at a version) " +
        "as a new independent table: hard-linked data files, fresh v1 log",
      Array(param("source", StringType), param("target", StringType),
        paramDefault("version", LongType, "NULL")),
      new StructType().add("cloned_files", LongType)
        .add("cloned_rows", LongType)) { in =>
      val asOf = if (in.isNullAt(2)) None else Some(in.getLong(2))
      val (files, rows) = LogTable.cloneTable(
        resolve(in.getString(0)), resolveNew(in.getString(1)), asOf)
      Seq(files.toLong, rows)
    },
    "restore" -> proc(
      "restore",
      "Roll the table's contents back to a version as one new commit " +
        "(history intact; restoring below a truncation checkpoint fails)",
      Array(param("table", StringType), param("version", LongType)),
      new StructType().add("restored_files", LongType)
        .add("restored_rows", LongType)) { in =>
      val (files, rows) = LogTable.restore(resolve(in.getString(0)), in.getLong(1))
      Seq(files.toLong, rows)
    },
    // Commit-history observability (DESCRIBE HISTORY's role): one row
    // per version still in the log, straight from the manifests — zero
    // data file reads, and row count is bounded by the retention policy
    // (history below a truncation checkpoint is gone by design).
    "snapshots" -> procMulti(
      "snapshots",
      "The table's commit history (oldest first): files/rows added, " +
        "files removed, checkpoint flag, streaming txn watermarks",
      Array(param("table", StringType)),
      new StructType().add("version", LongType).add("committed_at", TimestampType)
        .add("added_files", IntegerType)
        .add("added_rows", LongType).add("removed_files", IntegerType)
        .add("checkpoint", BooleanType).add("txns", StringType)
        // dead keys the commit marked via deletion vectors, and bulk
        // positional sidecars it attached: the operator's
        // compact()-pressure signals, appended last so positional
        // consumers keep their columns
        .add("dv_keys", LongType)
        .add("dv_pos_files", LongType)) { in =>
      LogTable.history(resolve(in.getString(0))).map { s =>
        Seq(s.version,
          if (s.commitTsMillis > 0L) s.commitTsMillis * 1000L else null,
          s.addedFiles, s.addedRows, s.removedFiles, s.checkpoint,
          if (s.txns.isEmpty) null
          else s.txns.toSeq.sortBy(_._1)
            .map { case (a, e) => s"$a=$e" }.mkString(","),
          s.dvKeys, s.dvPosFiles)
      }
    })
}
