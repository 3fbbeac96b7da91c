package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for repeated co-located joins — the engine's
  * answer to the reference's `CREATE INDEX idx_items_order ON
  * fct_order_items(order_id)` (reference `src/etl/load/ddl.sql:43`): a
  * warehouse table pre-hash-partitioned AND pre-sorted by the join key.
  *
  * A join of two tables bucketed the same way on the join key needs NO
  * exchange at query time (verified in `BucketingSpec`): at 100 TB that
  * removes the dominant shuffle of fact⋈fact joins (e.g. order items ⋈
  * orders on order_id) from EVERY downstream query, paying the
  * partitioning cost once at load time — exactly when the reference pays
  * its index-maintenance cost. */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. Bucket count is a
    * layout contract: both sides of a co-located join must agree on it
    * (and at scale it bounds per-bucket file size — size it so
    * table_size/buckets stays in the 100-500 MB range). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `${table.replace(".", "`.`")}`")
    // A fresh session's in-memory catalog never owned a previous run's
    // managed-table directory, so CREATE fails on the stale LOCATION even
    // after DROP — clear it explicitly (idempotent re-runs, like Load's
    // overwrite semantics). Managed-table layout: default db lives at the
    // warehouse root, any other db at <warehouse>/<db>.db/.
    // the LAST dot-segment is always the bare table name; a 3-part name
    // (catalog.db.table) previously fell into the 1-part branch and
    // computed <warehouse>/catalog.db.table — the stale dir was never
    // cleared and CREATE kept failing, defeating this very cleanup
    val (db, bare) = table.split('.') match {
      case Array(t) => (spark.catalog.currentDatabase.toLowerCase, t)
      case parts => (parts(parts.length - 2).toLowerCase, parts.last)
    }
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    val dbPath = if (db == "default") wh else new org.apache.hadoop.fs.Path(wh, s"$db.db")
    val loc = new org.apache.hadoop.fs.Path(dbPath, bare.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
  }

  /** Exact row count from parquet FOOTER metadata — a driver-side
    * catalog-style probe that runs ZERO Spark jobs and reads no data
    * pages (each footer records its row-group row counts). This is what
    * a staleness check should cost: a layout-vs-source row-count
    * comparison is two footer reads, not two table scans. Works on any
    * frame whose `inputFiles` are parquet (bucketed managed tables, the
    * fixture tables); the count is the FILES' count — only equal to
    * `df.count()` when the plan on top is row-preserving (projections
    * yes, filters/joins no), which is the caller's contract. */
  def footerRowCount(df: DataFrame): Long = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    df.inputFiles.iterator.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val r = graft.util.Footers.open(in)
      try r.getRecordCount
      finally r.close()
    }.sum
  }
}
