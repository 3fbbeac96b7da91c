package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ROLLUP / CUBE over LOW-CARDINALITY dimensions, computed as one plain
  * combinable groupBy over the input followed by the grouping-sets
  * expansion over the TINY base aggregate.
  *
  * Spark's native `df.rollup/cube` plans an Expand that duplicates every
  * input row once per grouping set (×3 for a 2-dim rollup, ×4 for a cube)
  * BEFORE the partial aggregation — at 100 TB that is 300-400 TB pushed
  * through the aggregation pipeline for dimensions with a handful of
  * distinct values. Re-aggregating the base instead makes the heavy pass
  * a plain map-side-combinable groupBy (the same shape as any dashboard
  * rollup), and runs the Expand over |distinct(dims)| rows, where it is
  * free. Both shapes shuffle the same tiny aggregate state.
  *
  * Requirements: every measure must be decomposable into a base partial
  * and a re-aggregation (sums and counts are; count re-aggregates as
  * `sum`). Money sums stay exact: the base carries unscaled long micros
  * ([[graft.util.Parity.moneyMicros]]) and the finisher reconstructs the
  * double once, so base→margin summation is order-independent long
  * addition, identical to the single-pass spelling.
  *
  * Reference semantics mirrored: DuckDB `GROUP BY ROLLUP/CUBE` with
  * `GROUPING()` indicators (x-ref g1/g2 oracle SQL in
  * [[graft.queries.WindowQueries]]).
  *
  * @param partials base-level aggregates (must include every column the
  *                 re-aggregation reads)
  * @param reaggs   grouping-set-level aggregates over the partial columns
  */
object Grouping {
  private def expand(
      base: DataFrame, d1: String, d2: String,
      reaggs: Seq[Column], finals: Seq[Column],
      viaCube: Boolean): DataFrame = {
    val grouped =
      if (viaCube) base.cube(col(d1), col(d2)) else base.rollup(col(d1), col(d2))
    grouped
      .agg(reaggs.head, reaggs.tail: _*)
      .select(col(d1) +: col(d2) +: finals: _*)
  }

  /** ROLLUP(d1, d2): grouping sets (d1,d2), (d1), (). */
  def lowCardRollup(df: DataFrame, d1: String, d2: String,
      partials: Seq[Column], reaggs: Seq[Column],
      finals: Seq[Column]): DataFrame =
    expand(df.groupBy(col(d1), col(d2)).agg(partials.head, partials.tail: _*),
      d1, d2, reaggs, finals, viaCube = false)

  /** CUBE(d1, d2): grouping sets (d1,d2), (d1), (d2), (). */
  def lowCardCube(df: DataFrame, d1: String, d2: String,
      partials: Seq[Column], reaggs: Seq[Column],
      finals: Seq[Column]): DataFrame =
    expand(df.groupBy(col(d1), col(d2)).agg(partials.head, partials.tail: _*),
      d1, d2, reaggs, finals, viaCube = true)

  /** ARBITRARY grouping sets over (d1, d2) — the shape ROLLUP/CUBE can't
    * spell (e.g. each dimension's margin + grand total WITHOUT the full
    * cross, the one-pass multi-dashboard query): same base-aggregate
    * discipline as the rollup/cube above — the heavy pass is ONE plain
    * combinable groupBy; Spark's grouping-sets Expand then runs over
    * |distinct(d1, d2)| rows, where duplicating per set is free. */
  def lowCardSets(df: DataFrame, d1: String, d2: String,
      sets: Seq[Seq[String]],
      partials: Seq[Column], reaggs: Seq[Column],
      finals: Seq[Column]): DataFrame =
    df.groupBy(col(d1), col(d2)).agg(partials.head, partials.tail: _*)
      .groupingSets(sets.map(_.map(col)), col(d1), col(d2))
      .agg(reaggs.head, reaggs.tail: _*)
      .select(col(d1) +: col(d2) +: finals: _*)
}
