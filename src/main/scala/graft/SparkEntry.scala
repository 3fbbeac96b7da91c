package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-module QueryDef packs; each
  * query name carries its SURVEY.md §2 operator id (a3_, j4_, k2_, …) so the
  * coverage inventory is auditable line by line.
  */
object SparkEntry {
  private val packs: Seq[QueryDef] =
    graft.queries.Dashboard.defs ++
      graft.queries.EtlQueries.defs ++
      graft.queries.ExtQueries.defs ++
      graft.queries.WindowQueries.defs ++
      graft.queries.MultimodalQueries.defs ++
      graft.queries.CorpusQueries.defs

  private val (queryMap, oracleMap) = QueryDef.toMaps(packs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Scan → broadcast dim join → hash agg → top-k, the engine's core shape. */
  def entry(spark: SparkSession): DataFrame =
    queryMap("a6_top_products")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleMap
}
