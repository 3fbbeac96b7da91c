package graft.sources.v2

import java.nio.file.Paths

import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

import graft.io.LogTable

/** The GROUP-REPLACEMENT batch write behind SQL UPDATE / MERGE INTO
  * (ReplaceData has no V1 fallback, so this is a real DSv2 BatchWrite):
  * each task streams its partition of the replacement rows into a
  * parquet part file under a row-level staging dir via the public
  * parquet-mr Group API — the writing twin of [[LogFileReader]], with
  * the SAME physical encodings [[graft.io.LogTable]]'s Spark-written
  * files use (INT64 TIMESTAMP_MICROS so footer stats exist, DATE as
  * INT32 days, UTF8 strings) — and the driver-side commit runs the one
  * shared footer-stats registration pass
  * ([[graft.io.LogTable.registerStaged]]) before swapping the scanned
  * files for the staged ones in a single manifest commit. Staging lives
  * under the table's own data root, so the per-file publish move stays
  * atomic; a dotfile prefix keeps readers from ever listing it.
  *
  * Local-mode note (same caveat as [[LogFileReader]]): tasks address
  * the staging dir by plain path; a multi-node deployment threads the
  * session's hadoop conf + a shared filesystem through the factory —
  * same shape, bigger payload. */
class LogGroupBatchWrite(
    path: String, snapVersion: Long, removeFiles: () => Seq[String],
    writeSchema: StructType,
    // RENAMED tables: tasks must write parts under PHYSICAL names
    // (files and manifest stats carry physical names forever; a
    // logical-named part would read as typed NULLs). The mapping is
    // pinned by the CALLER from the statement's resolved schema and
    // validated unchanged at commit — a rename landing mid-statement
    // fails loudly instead of registering parts the new mapping no
    // longer describes. Empty on never-renamed tables.
    mapping: Map[String, String] = Map.empty) extends BatchWrite {

  private val staging = LogTable.newStagingDir(path)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LogGroupWriterFactory(staging.toString,
      LogTable.physicalized(writeSchema, mapping).json)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val key = LogTable.tableKeyCol(path).getOrElse(
      throw new IllegalArgumentException(
        s"graft-log row-level op: $path predates the key-column " +
          "property — run one keyed write first"))
    // Register ONLY the parts named by the successful tasks' commit
    // messages: a leftover part from a failed/speculative attempt whose
    // abort() never ran (executor crash, lost JVM) must not ride into
    // the commit as duplicate rows — replaceStaged's cleanup deletes it
    // with the rest of staging instead.
    val committed = messages.collect {
      case LogGroupCommit(f) => Paths.get(f).getFileName.toString
    }.toSet
    LogTable.replaceStaged(SparkSession.active, path, snapVersion,
      removeFiles(), staging, writeSchema, key, onlyFiles = Some(committed),
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

private[v2] case class LogGroupCommit(file: String) extends WriterCommitMessage

class LogGroupWriterFactory(stagingDir: String, schemaJson: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LogGroupDataWriter(stagingDir, schemaJson, partitionId, taskId)
}

/** Per-epoch semantics, decided at stream start: `Append` commits the
  * epoch's rows as-is, `Upsert` replaces same-key rows (the
  * incremental-materialized-view refresh — Update output mode's
  * natural verb, opted into with `.option("upsert", true)`), `Replace`
  * swaps the whole table for the epoch's state (Complete mode). All
  * three are fenced by (queryId, epochId). */
private[v2] object EpochMode extends Enumeration {
  val Append, Upsert, Replace = Value
}

/** The native Structured Streaming SINK for graft-log tables:
  * `df.writeStream.format("graft-log").start(path)` — each micro-batch
  * lands as ONE transactional append commit through
  * [[graft.io.LogTable.commitStreamingEpoch]], with the streaming
  * query's id + epoch recorded in the manifest's `txns` map. That
  * watermark is what makes the sink EXACTLY-ONCE end to end: a retried
  * epoch (task retry survivors are already excluded by commit-message
  * scoping; a restarted driver replaying its last batch is the real
  * case) is detected as `epoch <= lastTxnEpoch(queryId)` and skipped,
  * so the log gains no duplicate rows, while the graft-log SOURCE side
  * replays version ranges idempotently — a log→log streaming pipeline
  * is exactly-once with no foreachBatch user code.
  *
  * Tasks write parquet parts with the SAME writer the row-level ops use
  * ([[LogGroupDataWriter]]), into one staging dir per epoch (epochs can
  * overlap in continuous-retry scenarios; sharing one dir would let an
  * aborted epoch's sweep delete a committing epoch's parts). */
class LogStreamingWrite(
    path: String, writeSchema: org.apache.spark.sql.types.StructType,
    keyCol: String, queryId: String,
    mode: EpochMode.Value = EpochMode.Append)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  // RENAMED tables (append/replace modes): epoch parts must carry
  // PHYSICAL names — the mapping pins at stream start and every epoch
  // commit validates it unchanged (a mid-stream rename fails the epoch
  // loudly; the restart re-pins). Upsert mode keeps LOGICAL parts: its
  // epochs read the parts back as a frame and route through
  // LogTable.upsertImpl → writeData, which maps on its own.
  private val mapping: Map[String, String] =
    if (mode == EpochMode.Upsert) Map.empty
    else LogTable.mappingOf(LogTable.snapshotWithSchema(path, None)._3)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new LogStreamingWriterFactory(path,
      LogTable.physicalized(writeSchema, mapping).json, queryId)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.collect {
      case LogGroupCommit(f) => Paths.get(f).getFileName.toString
    }.toSet
    // tasks stage into per-epoch dirs they create on demand (the
    // factory can't know the epoch at driver time in all engines, so
    // the dir is derived from the part names' parents)
    val stagingDirs = messages.collect {
      case LogGroupCommit(f) => Paths.get(f).getParent
    }.distinct
    try {
      if (committed.nonEmpty) {
        require(stagingDirs.length == 1,
          s"graft-log streaming sink: epoch $epochId staged into " +
            s"${stagingDirs.length} directories — commit messages disagree")
        mode match {
          case EpochMode.Upsert =>
            LogTable.upsertEpoch(SparkSession.active, path,
              stagingDirs.head, committed, writeSchema, keyCol, queryId, epochId)
          case m =>
            LogTable.commitStreamingEpoch(SparkSession.active, path,
              stagingDirs.head, committed, writeSchema, keyCol, queryId, epochId,
              replaceAll = m == EpochMode.Replace, writtenMapping = mapping)
        }
      } else if (mode == EpochMode.Replace) {
        // Complete mode with an empty state: the epoch truncates the
        // table — still one fenced commit (an empty staging dir serves)
        val empty = LogTable.newStagingDir(path)
        try LogTable.commitStreamingEpoch(SparkSession.active, path,
          empty, Set.empty, writeSchema, keyCol, queryId, epochId,
          replaceAll = true, writtenMapping = mapping)
        finally sweep(empty)
      }
    } finally stagingDirs.foreach(sweep)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case LogGroupCommit(f) => Paths.get(f).getParent }
      .distinct.foreach(sweep)

  private def sweep(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.isDirectory(dir)) {
      val it = java.nio.file.Files.list(dir)
      try it.iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally it.close()
      java.nio.file.Files.deleteIfExists(dir)
    }
  }
}

/** Streaming twin of [[LogGroupWriterFactory]]: same part writer, but
  * staged under a per-(query, epoch) dot-directory so retried epochs
  * reuse their dir while two QUERIES streaming into one table at the
  * same epoch number can never share one — a shared dir would let query
  * A's post-commit sweep delete query B's in-flight parts. Part names
  * carry (partition, task) for uniqueness across attempts. */
class LogStreamingWriterFactory(
    tablePath: String, schemaJson: String, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] = {
    // deterministic per (query, epoch), created lazily by the first
    // task that reaches it (createDirectories is idempotent); lives
    // under data/ so the registration move stays atomic. The FULL
    // queryId (a UUID, filesystem-safe) is the key, not its 32-bit
    // hash: two queries colliding on the hash at the same epoch number
    // would share a dir, and one query's post-commit sweep would delete
    // the other's in-flight parts — the exact failure per-query dirs
    // exist to prevent.
    val staging = java.nio.file.Paths.get(tablePath, "data",
      s".staging-q$queryId-epoch-$epochId")
    java.nio.file.Files.createDirectories(staging)
    new LogGroupDataWriter(staging.toString, schemaJson,
      partitionId, taskId)
  }
}

/** One task's parquet part writer over the flat warehouse type set.
  * Type → physical mapping mirrors what Spark's own writer produces
  * under the table's forced TIMESTAMP_MICROS conf, so
  * [[graft.io.LogTable.registerStaged]]'s footer pass and every reader
  * treat task-written and Spark-written files identically. */
class LogGroupDataWriter(
    stagingDir: String, schemaJson: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]

  private val messageType: MessageType = {
    val fields: Array[Type] = schema.fields.map { f =>
      val rep =
        if (f.nullable) Type.Repetition.OPTIONAL else Type.Repetition.REQUIRED
      val b: Types.PrimitiveBuilder[PrimitiveType] = f.dataType match {
        case LongType => Types.primitive(PrimitiveTypeName.INT64, rep)
        case IntegerType => Types.primitive(PrimitiveTypeName.INT32, rep)
        case ShortType => Types.primitive(PrimitiveTypeName.INT32, rep)
          .as(LogicalTypeAnnotation.intType(16, true))
        case DoubleType => Types.primitive(PrimitiveTypeName.DOUBLE, rep)
        case FloatType => Types.primitive(PrimitiveTypeName.FLOAT, rep)
        case BooleanType => Types.primitive(PrimitiveTypeName.BOOLEAN, rep)
        case StringType => Types.primitive(PrimitiveTypeName.BINARY, rep)
          .as(LogicalTypeAnnotation.stringType())
        case BinaryType => Types.primitive(PrimitiveTypeName.BINARY, rep)
        case DateType => Types.primitive(PrimitiveTypeName.INT32, rep)
          .as(LogicalTypeAnnotation.dateType())
        case TimestampType => Types.primitive(PrimitiveTypeName.INT64, rep)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case TimestampNTZType => Types.primitive(PrimitiveTypeName.INT64, rep)
          .as(LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case dt => throw new UnsupportedOperationException(
          s"graft-log group writer: column ${f.name} of type " +
            s"${dt.catalogString} is outside the flat warehouse type set")
      }
      b.named(f.name)
    }
    new MessageType("spark_schema", fields: _*)
  }

  private val file =
    Paths.get(stagingDir, s"part-$partitionId-$taskId.parquet").toString
  // cheap copy of the JVM-shared conf (r22): a bare `new Configuration()`
  // re-parsed the Hadoop XML defaults once per write TASK; the copy
  // constructor clones the already-materialized properties without a
  // parse, and stays private to this writer in case the write path
  // mutates it
  private val conf =
    new org.apache.hadoop.conf.Configuration(graft.util.Footers.sharedConf)
  private val writer = ExampleParquetWriter
    .builder(new org.apache.hadoop.fs.Path(file))
    .withType(messageType)
    .withConf(conf)
    .build()
  private val factory = new SimpleGroupFactory(messageType)

  // Group-based ReplaceData rows may arrive PREPENDED with Spark's
  // __row_operation metrics marker (RowDeltaUtils.OPERATION_COLUMN):
  // the rewrite plans Project[__row_operation, <table cols>] and the
  // ProjectingInternalRow that would strip it is dropped by
  // ReplaceDataExec.writingTask when no metadata projection exists, so
  // the raw query rows reach the writer. The offset (0 or 1) is decided
  // once from the first row's arity — and when a marker is presumed, it
  // is VALIDATED against RowDeltaUtils' operation-value set before any
  // row is written: a Spark version that moved the marker (or added a
  // second metadata column) fails loudly here instead of silently
  // scattering values one column over. (The marker carries no names at
  // the task level — InternalRow is positional — so the constant set is
  // the strongest by-name anchor available.)
  private var fieldOffset = -1

  private def validOperationMarker(row: InternalRow): Boolean = {
    import org.apache.spark.sql.catalyst.util.RowDeltaUtils
    !row.isNullAt(0) && {
      val v = row.getInt(0)
      v == RowDeltaUtils.DELETE_OPERATION || v == RowDeltaUtils.UPDATE_OPERATION ||
        v == RowDeltaUtils.INSERT_OPERATION || v == RowDeltaUtils.REINSERT_OPERATION ||
        v == RowDeltaUtils.WRITE_OPERATION ||
        v == RowDeltaUtils.WRITE_WITH_METADATA_OPERATION
    }
  }

  override def write(row: InternalRow): Unit = {
    if (fieldOffset < 0) {
      fieldOffset = row.numFields - schema.length
      require(fieldOffset == 0 || fieldOffset == 1,
        s"graft-log group writer: row arity ${row.numFields} does not match " +
          s"write schema arity ${schema.length} (+ optional operation marker)")
      require(fieldOffset == 0 || validOperationMarker(row),
        s"graft-log group writer: row arity ${row.numFields} exceeds the " +
          s"write schema's ${schema.length} but the leading field is not a " +
          "RowDeltaUtils operation marker — refusing to shift columns")
    }
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      val j = i + fieldOffset
      if (!row.isNullAt(j)) {
        val name = schema(i).name
        schema(i).dataType match {
          case LongType | TimestampType | TimestampNTZType =>
            g.add(name, row.getLong(j))
          case IntegerType | DateType => g.add(name, row.getInt(j))
          case ShortType => g.add(name, row.getShort(j).toInt)
          case DoubleType => g.add(name, row.getDouble(j))
          case FloatType => g.add(name, row.getFloat(j))
          case BooleanType => g.add(name, row.getBoolean(j))
          case StringType =>
            g.add(name, Binary.fromReusedByteArray(row.getUTF8String(j).getBytes))
          case BinaryType =>
            g.add(name, Binary.fromReusedByteArray(row.getBinary(j)))
          case dt => throw new UnsupportedOperationException(
            s"graft-log group writer: unexpected type ${dt.catalogString}")
        }
      }
      i += 1
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    LogGroupCommit(file)
  }

  override def abort(): Unit = {
    writer.close()
    java.nio.file.Files.deleteIfExists(Paths.get(file))
  }

  override def close(): Unit = ()
}
