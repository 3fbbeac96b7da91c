package graft.sources.v2

import java.nio.file.{Files, Path, Paths}
import java.util

import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.LogTable

/** SQL catalog over a directory of [[graft.io.LogTable]]s — the piece
  * that puts log tables on the `spark.sql` surface the reference's
  * whole analytic layer speaks (every dashboard query is SQL over
  * warehouse tables, reference app.py:28-39; the schema bootstrap is
  * `CREATE TABLE IF NOT EXISTS` DDL, ddl.sql:1-43):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graftlog", classOf[LogCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graftlog.warehouse", "/data/logwh")
  *   spark.sql("CREATE TABLE graftlog.etl.orders (order_id BIGINT, total DOUBLE) " +
  *     "TBLPROPERTIES ('keyCol'='order_id')")
  *   spark.sql("INSERT INTO graftlog.etl.orders SELECT ...")
  *   spark.sql("SELECT * FROM graftlog.etl.orders VERSION AS OF 3")
  * }}}
  *
  * Layout is the obvious one: a namespace is a directory under the
  * configured `warehouse` root, a table is a directory holding a
  * `_log`. Everything data-path flows through the ONE implementation
  * the DSv2 connector and the Scala API already share — reads plan
  * through [[LogTableTable]] (manifest-stats file skipping, column
  * pruning, streaming tail), `INSERT INTO` lands in [[LogTable.append]]
  * via the same write builder, and `CREATE TABLE` commits an empty v1
  * manifest carrying the schema and the `keyCol` table property
  * ([[LogTable.createEmpty]]) so every later writer resolves the key
  * from the log.
  *
  * `ALTER TABLE ADD/DROP/RENAME COLUMN` are served as schema-evolution
  * commits (ADD is the reference's migration playbook,
  * migrate_duckdb.py; RENAME is a metadata-only column-mapping commit,
  * [[graft.io.LogTable.renameColumn]]); retypes, repositions, and
  * partition transforms stay loudly unsupported (the log IS the schema
  * history — forking it silently corrupts reads, and the format's
  * pruning unit is per-file manifest stats, not directory
  * partitions). */
class LogCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Paths.get(Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"LogCatalog '$name': set spark.sql.catalog.$name.warehouse to the " +
          "directory holding the log tables")))
  }

  override def name(): String = catalogName

  private def dirOf(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)(_.resolve(_))

  private def pathOf(ident: Identifier): String =
    dirOf(ident.namespace()).resolve(ident.name()).toString

  private def isTableDir(p: Path): Boolean =
    Files.isDirectory(p.resolve("_log"))

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirOf(namespace)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    val stream = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .filter(isTableDir)
        .map(p => Identifier.of(namespace, p.getFileName.toString))
        .toArray
    } finally stream.close()
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(Paths.get(pathOf(ident)))

  override def loadTable(ident: Identifier): Table = loadAt(ident, None)

  /** `VERSION AS OF v` time travel — same snapshot rule as the
    * connector's `asOf` option. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadAt(ident, Some(version.toLong))

  /** `TIMESTAMP AS OF t` time travel — Spark hands the instant as epoch
    * MICROS; it resolves to the last version committed at or before it
    * via the manifests' stamped commit times (mtime fallback for
    * pre-stamp logs), then reads exactly as `VERSION AS OF` would. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = pathOf(ident)
    if (!isTableDir(Paths.get(path))) throw new NoSuchTableException(ident)
    loadAt(ident, Some(LogTable.versionAtTimestamp(path, timestampMicros / 1000L)))
  }

  private def loadAt(ident: Identifier, asOf: Option[Long]): Table = {
    val path = pathOf(ident)
    if (!isTableDir(Paths.get(path))) throw new NoSuchTableException(ident)
    new LogTableTable(path, LogTableProvider.schemaOf(path, asOf), asOf)
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "graft-log: partition transforms are not supported — the format " +
        "prunes by per-file manifest stats, not directory partitions")
    // keyCol arrives as a table property (DDL TBLPROPERTIES) or a write
    // option (DataFrameWriterV2 .option(...) lands under OPTION_PREFIX)
    import scala.jdk.CollectionConverters._
    val props = properties.asScala
    val keyCol = props.collectFirst {
      case (k, v) if k.equalsIgnoreCase("keyCol") ||
        k.equalsIgnoreCase(TableCatalog.OPTION_PREFIX + "keyCol") => v
    }.getOrElse(throw new IllegalArgumentException(
      s"graft-log: CREATE TABLE ${ident.toString} needs the key column — " +
        "TBLPROPERTIES ('keyCol'='<column>')"))
    // every other TBLPROPERTIES entry persists in the v1 manifest
    // (LogTable.tableProps serves the fold; SHOW TBLPROPERTIES surfaces
    // them) — minus Spark's own bookkeeping keys and write options
    val sparkInternal = Set("provider", "location", "owner", "comment",
      "external", "is_managed_location")
    val userProps = props.collect {
      case (k, v) if !k.equalsIgnoreCase("keyCol") &&
        !k.toLowerCase.startsWith(TableCatalog.OPTION_PREFIX) &&
        !sparkInternal(k.toLowerCase) => k -> v
    }.toMap
    val path = pathOf(ident)
    Files.createDirectories(dirOf(ident.namespace()))
    try LogTable.createEmpty(path, schema, keyCol, userProps)
    catch {
      case _: graft.io.TableAlreadyExistsException =>
        throw new TableAlreadyExistsException(ident)
    }
    new LogTableTable(path, LogTableProvider.schemaOf(path, None), None)
  }

  /** `ALTER TABLE ADD COLUMN(S)` — served as a schema-evolution commit
    * ([[LogTable.addColumns]]: an empty manifest carrying the widened
    * schema; old files read the new columns as typed NULLs, time travel
    * before the ALTER keeps the old shape). This is exactly the
    * reference's migration playbook (migrate_duckdb.py:7-26), so a SQL
    * user running it gets the reference's IF-NOT-EXISTS no-op, not an
    * error. DROP/RENAME land as metadata-only evolution commits, and
    * ALTER COLUMN TYPE is supported for WIDENING promotions only
    * (LogTable.widenColumn — Iceberg's matrix); every other change kind
    * stays loudly unsupported: the log IS the schema history, and
    * narrowing retypes or repositions would fork it. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = pathOf(ident)
    if (!isTableDir(Paths.get(path))) throw new NoSuchTableException(ident)
    // SET/UNSET TBLPROPERTIES: one metadata commit carrying the whole
    // statement's delta (LogTable.setProperties; unset keys tombstone
    // in the fold). Never mixed with column changes — Spark's grammar
    // already separates the statements, so a mix is a programmatic call
    // and refuses rather than half-applying.
    val propSets = changes.collect { case s: TableChange.SetProperty => s }
    val propRemoves = changes.collect { case r: TableChange.RemoveProperty => r }
    if (propSets.nonEmpty || propRemoves.nonEmpty) {
      if (propSets.size + propRemoves.size != changes.size)
        throw new UnsupportedOperationException(
          "graft-log: ALTER TABLE cannot mix TBLPROPERTIES changes with " +
            "column changes in one statement")
      LogTable.setProperties(path,
        propSets.map(s => s.property -> s.value).toMap,
        propRemoves.map(_.property))
      return loadTable(ident)
    }
    // validate EVERY change before committing ANY (an ALTER is one
    // statement — half-applying `ADD COLUMNS (a INT, b MAP<..>)` would
    // leave a state no serial execution produces), then land the whole
    // column list as ONE schema-evolution commit
    val (dropChanges, rest) = changes.partition(_.isInstanceOf[TableChange.DeleteColumn])
    if (dropChanges.nonEmpty && rest.nonEmpty) throw new UnsupportedOperationException(
      "graft-log: ALTER TABLE cannot mix DROP COLUMN with other changes " +
        "in one statement")
    // RENAME COLUMN — one column per statement (Spark's own grammar), as
    // a metadata-only column-mapping commit (LogTable.renameColumn: zero
    // files rewritten; reads project physical → logical from then on)
    changes.collect { case r: TableChange.RenameColumn => r } match {
      case Seq(r) if changes.length == 1 =>
        if (r.fieldNames().length != 1) throw new UnsupportedOperationException(
          "graft-log: ALTER TABLE RENAME COLUMN supports top-level columns " +
            s"only, got nested field ${r.fieldNames().mkString(".")}")
        LogTable.renameColumn(
          org.apache.spark.sql.SparkSession.active, path,
          r.fieldNames()(0), r.newName())
        return loadTable(ident)
      case Seq(_, _*) => throw new UnsupportedOperationException(
        "graft-log: ALTER TABLE cannot mix RENAME COLUMN with other changes " +
          "in one statement")
      case _ => ()
    }
    // ALTER COLUMN ... TYPE — type WIDENING only (Iceberg's matrix), as
    // a metadata-only commit (LogTable.widenColumn: zero files
    // rewritten; reads upcast narrow physical files at scan time).
    // One column per statement, same as RENAME.
    changes.collect { case u: TableChange.UpdateColumnType => u } match {
      case Seq(u) if changes.length == 1 =>
        if (u.fieldNames().length != 1) throw new UnsupportedOperationException(
          "graft-log: ALTER TABLE ALTER COLUMN TYPE supports top-level " +
            s"columns only, got nested field ${u.fieldNames().mkString(".")}")
        LogTable.widenColumn(
          org.apache.spark.sql.SparkSession.active, path,
          u.fieldNames()(0), u.newDataType())
        return loadTable(ident)
      case Seq(_, _*) => throw new UnsupportedOperationException(
        "graft-log: ALTER TABLE cannot mix ALTER COLUMN TYPE with other " +
          "changes in one statement")
      case _ => ()
    }
    if (dropChanges.nonEmpty) {
      // DROP COLUMN(S) as one narrowing schema-evolution commit —
      // metadata-only (reads project the committed schema by name); the
      // bytes purge on the next compact, and re-binding the name before
      // that fails loudly in addColumns (no silent value resurrection)
      val dels = dropChanges.map(_.asInstanceOf[TableChange.DeleteColumn])
      dels.foreach { d =>
        if (d.fieldNames().length != 1) throw new UnsupportedOperationException(
          "graft-log: ALTER TABLE DROP COLUMN supports top-level columns " +
            s"only, got nested field ${d.fieldNames().mkString(".")}")
      }
      LogTable.dropColumns(
        org.apache.spark.sql.SparkSession.active, path,
        dels.map(_.fieldNames()(0)),
        ifExists = dels.forall(_.ifExists()))
      return loadTable(ident)
    }
    val added = changes.map {
      case add: TableChange.AddColumn =>
        if (add.fieldNames().length != 1) throw new UnsupportedOperationException(
          "graft-log: ALTER TABLE ADD COLUMN supports top-level columns " +
            s"only, got nested field ${add.fieldNames().mkString(".")}")
        if (!add.isNullable) throw new UnsupportedOperationException(
          "graft-log: added columns must be nullable — existing rows " +
            "surface them as NULL")
        // loud on FIRST/AFTER rather than silently appending at the end
        // of the schema (columns land last; order is not honored)
        if (add.position() != null) throw new UnsupportedOperationException(
          "graft-log: ALTER TABLE ADD COLUMN does not support FIRST/AFTER " +
            "— added columns land at the end of the schema")
        val f = org.apache.spark.sql.types.StructField(
          add.fieldNames()(0), add.dataType(), nullable = true)
        Option(add.comment()).fold(f)(f.withComment)
      case other => throw new UnsupportedOperationException(
        s"graft-log: ALTER TABLE change ${other.getClass.getSimpleName} is " +
          "not supported — only ADD COLUMN / DROP COLUMN / RENAME COLUMN / " +
          "ALTER COLUMN TYPE (widening) — narrowing retypes and " +
          "repositions would fork the log's schema history")
    }
    LogTable.addColumns(
      org.apache.spark.sql.SparkSession.active, path, added)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = Paths.get(pathOf(ident))
    if (!isTableDir(dir)) return false
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(dir)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(Files.deleteIfExists(_))
    finally walk.close()
    true
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = Paths.get(pathOf(from))
    val dst = Paths.get(pathOf(to))
    if (!isTableDir(src)) throw new NoSuchTableException(from)
    if (Files.exists(dst)) throw new TableAlreadyExistsException(to)
    Files.createDirectories(dst.getParent)
    Files.move(src, dst)
  }

  // ---- maintenance procedures: CALL <cat>.system.<proc>(...) ----

  private lazy val procedures =
    LogProcedures.forCatalog(
      resolve = { dotted =>
        val parts = dotted.split('.')
        val p = parts.foldLeft(warehouse)(_.resolve(_))
        if (!isTableDir(p)) throw new NoSuchTableException(
          Identifier.of(parts.init, parts.last))
        p.toString
      },
      resolveNew = { dotted =>
        val parts = dotted.split('.')
        val p = parts.foldLeft(warehouse)(_.resolve(_))
        if (!Files.isDirectory(p.getParent)) throw new NoSuchNamespaceException(
          parts.init)
        if (Files.exists(p)) throw new TableAlreadyExistsException(
          Identifier.of(parts.init, parts.last))
        p.toString
      })

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!ident.namespace().sameElements(Array("system")))
      throw new RuntimeException(
        s"graft-log: procedures live in the 'system' namespace — " +
          s"CALL $catalogName.system.<name>(...), got ${ident.toString}")
    procedures.getOrElse(ident.name(), throw new RuntimeException(
      s"graft-log: unknown procedure '${ident.name()}' — available: " +
        procedures.keys.toSeq.sorted.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      procedures.keys.toArray.sorted.map(Identifier.of(Array("system"), _))
    else Array.empty

  // ---- namespaces (directories without a _log) ----

  override def defaultNamespace(): Array[String] = Array("default")

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = dirOf(namespace)
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    val stream = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala
        .filter(p => Files.isDirectory(p) && !isTableDir(p))
        .map(p => namespace :+ p.getFileName.toString)
        .toArray
    } finally stream.close()
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val dir = dirOf(namespace)
      Files.isDirectory(dir) && !isTableDir(dir)
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(namespace)
    Files.createDirectories(dirOf(namespace))
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft-log: namespaces are plain directories — nothing to alter")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = dirOf(namespace)
    if (!Files.isDirectory(dir)) return false
    import scala.jdk.CollectionConverters._
    if (!cascade) {
      val stream = Files.list(dir)
      val empty = try !stream.iterator().hasNext finally stream.close()
      if (!empty) throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        namespace)
      Files.delete(dir)
    } else {
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
    true
  }
}
