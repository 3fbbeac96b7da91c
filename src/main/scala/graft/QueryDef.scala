package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable unit of engine surface.
  *
  * Every operator from SURVEY.md §2 is exposed as a named `QueryDef`: a Spark
  * DataFrame program plus (where SQL-expressible) an ANSI-SQL twin that the
  * driver runs in DuckDB over the identical parquet inputs. The driver
  * hash-compares the two results, so:
  *   - every output column is aliased identically on both sides;
  *   - every query ends in a total ORDER BY (deterministic row order);
  *   - float aggregation goes through [[graft.util.Parity]] (exact,
  *     order-independent decimal sums) so both engines produce bit-equal
  *     doubles.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object QueryDef {
  /** Fold a pack of QueryDefs into the two driver-facing maps. */
  def toMaps(defs: Seq[QueryDef])
      : (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    // toMap is last-wins: a name collision between packs would silently
    // drop a query from verify AND bench, shrinking coverage with no error
    val dups = defs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names across packs: ${dups.mkString(", ")}")
    val q = defs.map(d => d.name -> d.run).toMap
    val o = defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
    (q, o)
  }
}
