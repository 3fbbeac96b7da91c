package graft.sources.v2

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.LogTable

/** SQL UPDATE / MERGE / DELETE as DELTA-BASED row-level operations (the
  * DSv2 `SupportsDelta` surface) — the MERGE-ON-READ twin of
  * [[LogGroupBatchWrite]]'s copy-on-write group replacement, selected by
  * `spark.graft.rowLevel.mode = merge-on-read`.
  *
  * Shape: Spark's rewrite rules plan the statement as a row DELTA — one
  * `delete(metadata, id)` / `update(metadata, id, row)` / `insert(row)`
  * call per affected row — instead of recomputing affected files' full
  * replacement contents. The writer turns that feed into exactly the
  * engine's deletion-vector commit ([[graft.io.LogTable.mergeDV]]'s
  * manifest shape): dead rows become per-FILE key vectors (the `_file`
  * metadata column rides the scan, so each dead key lands only on the
  * file that actually holds it), update images and unmatched inserts
  * append as new parts, and ONE manifest commit carries both — zero data
  * files rewritten. A 10-key MERGE into a 10 GB file costs one vector
  * entry and a tiny appended part; at 100 TB that is the difference
  * between interactive row-level SQL and an hours-long rewrite. The
  * bytes linger until [[graft.io.LogTable.compact]] — the published
  * formats' DV trade, vacuumed on the same path as every other vector.
  *
  * The row identity is the table's key column (Spark requires a
  * NON-NULLABLE rowId, which is why the connector only offers this mode
  * on tables whose manifest stats PROVE the key null-free — the Iceberg
  * identifier-field rule, enforced on every registration). Bounded by
  * [[graft.io.LogTable.DvMaxKeys]] matched keys per statement: vectors
  * are the small-delta path, and the task-side guard fails a bulk
  * UPDATE loudly with the copy-on-write hint instead of building a
  * manifest-sized vector.
  *
  * Runtime group filtering is DELIBERATELY absent here (Spark's
  * RowLevelOperationRuntimeGroupFiltering matches only group-based
  * ReplaceData, and we do not add a delta twin): that rule pays for a
  * second matched-rows scan by shrinking the REWRITE — worth it when
  * pass two feeds whole-file rewrites, pure overhead when the write is
  * already only the delta. The delta scan still prunes statically: the
  * statement's pushable predicates reach the manifest stats through the
  * same LogTableScanBuilder as every read.
  *
  * Reference context: the reference's own row-level verbs are DuckDB
  * UPDATE/DELETE over a single-node file
  * (`/root/reference/src/etl/load/ddl.sql`, `run.py:88-94`); this is
  * the same statement surface re-expressed for a manifest-planned,
  * multi-writer log table. */
class LogDeltaRowLevelOperation(
    path: String, tableSchema: StructType, keyCol: String,
    fileColIsMetadata: Boolean,
    info: RowLevelOperationInfo) extends SupportsDelta {

  // ONE snapshot pinned across the statement's search scan and its
  // delta commit — same discipline as the group-based op: decisions and
  // the commit's read-set validation describe the same version.
  private val (snapVersion, snapshot, _) =
    LogTable.snapshotWithSchema(path, None)

  override def command(): RowLevelOperation.Command = info.command()

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(keyCol))

  /** Updates arrive as DELETE + INSERT pairs rather than update() calls:
    * for this writer the two spellings commit identically (the old key
    * vectors, the image appends), and the split is what lets Spark
    * accept an UPDATE that reassigns the KEY column itself — the old
    * identity dies, the new one inserts (rejected outright with
    * in-place updates, since the row ID would change under the write). */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  /** `_file` in the delta feed is what makes vectors PRECISE: each dead
    * key attaches only to the file that served the row, never to every
    * file whose key range happens to cover it. Skipped when a data
    * column shadows the name — the writer then falls back to range
    * placement, which is exactly [[graft.io.LogTable.deleteKeysDV]]'s
    * (correct, slightly wider) semantics. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    if (fileColIsMetadata) Array(Expressions.column(LogTableTable.FileCol))
    else Array.empty

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LogTableScanBuilder(path, tableSchema, None,
      pinnedSnapshot = Some(snapshot), pinnedVersion = Some(snapVersion))

  override def newWriteBuilder(wi: LogicalWriteInfo): DeltaWriteBuilder = {
    // UPDATE/MERGE images arrive aligned to the table's columns (the
    // rewrite rules align assignments); DELETE has no row image and may
    // report an empty schema. Either way the PART schema is the table's.
    val rs = wi.schema()
    require(rs.isEmpty || rs.fieldNames.sameElements(tableSchema.fieldNames),
      s"graft-log merge-on-read on $path: delta row schema " +
        s"[${rs.fieldNames.mkString(",")}] does not match the table's " +
        s"[${tableSchema.fieldNames.mkString(",")}]")
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new LogDeltaBatchWrite(path, snapVersion, snapshot,
            tableSchema, keyCol)
      }
    }
  }

  override def description(): String =
    s"graft_log_merge_on_read($path@v$snapVersion)"
}

/** Driver half of the delta write: collects every task's (staged part,
  * per-file dead keys) and lands them as ONE deletion-vector manifest
  * commit via [[graft.io.LogTable.commitDeltaStaged]]. */
class LogDeltaBatchWrite(
    path: String, snapVersion: Long,
    snapshot: Seq[LogTable.FileEntry],
    tableSchema: StructType, keyCol: String) extends DeltaBatchWrite {

  private val staging = LogTable.newStagingDir(path)

  // RENAMED tables: task parts carry PHYSICAL names. The mapping comes
  // from the STATEMENT'S OWN resolved schema (tableSchema carries the
  // rename metadata the table load served), not a fresh head read — so
  // the parts agree with the names Spark resolved the statement
  // against, and the commit-time stability guard covers every rename
  // that lands after resolution.
  private val mapping = LogTable.mappingOf(Some(tableSchema))

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    val keyType = tableSchema(keyCol).dataType
    new LogDeltaWriterFactory(staging.toString,
      LogTable.physicalized(tableSchema, mapping).json, keyType.json)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val commits = messages.collect { case m: LogDeltaCommit => m }
    // only parts named by SUCCESSFUL tasks register (leftover parts from
    // crashed speculative attempts sweep with staging — the same
    // commit-message scoping as the group write)
    val parts = commits.flatMap(_.part)
      .map(f => Paths.get(f).getFileName.toString).toSet
    val deadByFile = commits.iterator.flatMap(_.deadByFile.iterator)
      .foldLeft(Map.empty[String, Seq[Long]]) { case (acc, (f, ks)) =>
        acc.updated(f, acc.getOrElse(f, Seq.empty) ++ ks)
      }
    val loose = commits.iterator.flatMap(_.looseKeys.iterator).toSeq
    LogTable.commitDeltaStaged(SparkSession.active, path, snapVersion,
      snapshot, staging, parts, tableSchema, keyCol, deadByFile, loose,
      writtenMapping = mapping)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.isDirectory(staging)) {
      val it = java.nio.file.Files.list(staging)
      try it.iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally it.close()
      java.nio.file.Files.deleteIfExists(staging)
    }
  }
}

/** One task's contribution: at most one staged parquet part (update
  * images + inserts; None when the task only deleted), the dead keys it
  * could place precisely (by the scan's `_file` metadata), and the ones
  * it could not (a data column shadows `_file`) for driver-side range
  * placement. */
private[v2] case class LogDeltaCommit(
    part: Option[String],
    deadByFile: Map[String, Seq[Long]],
    looseKeys: Seq[Long]) extends WriterCommitMessage

class LogDeltaWriterFactory(
    stagingDir: String, schemaJson: String, keyTypeJson: String)
    extends DeltaWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new LogDeltaDataWriter(stagingDir, schemaJson, keyTypeJson,
      partitionId, taskId)
}

/** Task half: `insert`/`update` images stream into ONE parquet part via
  * the shared [[LogGroupDataWriter]] (identical physical encodings to
  * every other write path, so footer stats register the same); dead rows
  * accumulate as (file → keys). The projections Spark hands in are
  * REUSED mutable views — every value is read out before returning. */
class LogDeltaDataWriter(
    stagingDir: String, schemaJson: String, keyTypeJson: String,
    partitionId: Int, taskId: Long) extends DeltaWriter[InternalRow] {

  private var part: LogGroupDataWriter = null
  private def partWriter: LogGroupDataWriter = {
    if (part == null)
      part = new LogGroupDataWriter(stagingDir, schemaJson, partitionId, taskId)
    part
  }

  private val deadByFile =
    scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.ArrayBuffer[Long]]
  private val loose = scala.collection.mutable.ArrayBuffer.empty[Long]
  private var deadCount = 0L

  private val keyGet: InternalRow => Long =
    DataType.fromJson(keyTypeJson) match {
      case LongType => r => r.getLong(0)
      case IntegerType => r => r.getInt(0).toLong
      case ShortType => r => r.getShort(0).toLong
      case dt => throw new UnsupportedOperationException(
        s"graft-log merge-on-read: key type ${dt.catalogString} is not " +
          "integral — deletion vectors address rows by integral key")
    }

  private def recordDead(metadata: InternalRow, id: InternalRow): Unit = {
    require(id != null && !id.isNullAt(0),
      "graft-log merge-on-read: a matched row carries a NULL key — " +
        "registration forbids null keys, so this table predates the " +
        "contract; compact() it or use copy-on-write")
    deadCount += 1
    if (deadCount > LogTable.DvMaxKeys) throw new IllegalArgumentException(
      s"graft-log merge-on-read: one task alone matched > " +
        s"${LogTable.DvMaxKeys} keys — deletion vectors are the " +
        "small-delta path; SET spark.graft.rowLevel.mode=copy-on-write " +
        "for bulk changes (or raise graft.dv.maxKeys)")
    val k = keyGet(id)
    if (metadata != null && metadata.numFields > 0 && !metadata.isNullAt(0))
      deadByFile.getOrElseUpdate(metadata.getUTF8String(0).toString,
        scala.collection.mutable.ArrayBuffer.empty) += k
    else loose += k
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit =
    recordDead(metadata, id)

  override def update(
      metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    recordDead(metadata, id)
    partWriter.write(row)
  }

  override def insert(row: InternalRow): Unit = partWriter.write(row)

  override def write(row: InternalRow): Unit = partWriter.write(row)

  override def commit(): WriterCommitMessage = {
    val staged = if (part == null) None else part.commit() match {
      case LogGroupCommit(f) => Some(f)
    }
    LogDeltaCommit(staged,
      deadByFile.view.mapValues(_.toSeq).toMap, loose.toSeq)
  }

  override def abort(): Unit = if (part != null) part.abort()

  override def close(): Unit = ()
}
