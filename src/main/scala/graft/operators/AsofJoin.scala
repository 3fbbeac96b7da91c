package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series operator Spark's built-in join set lacks
  * (extension surface per SURVEY.md §2.4 note): for each left row, attach
  * the most recent right row of the same key with
  * `rightTime <= leftTime` (left-outer semantics: no prior right row →
  * NULL right columns).
  *
  * Implementation is the composition that survives scale (preference (a)
  * of the custom-operator ladder — no custom plan node needed): tag both
  * sides, UNION, then `last(col, ignoreNulls)` over a key-partitioned
  * time-ordered running window, keeping left rows. ONE shuffle on the
  * key, linear in |left|+|right| — never a per-row range probe, never the
  * quadratic key×time blowup of an inequality join. At the tie
  * `rightTime == leftTime` the right row sorts BEFORE the left row, so
  * the left row sees it (the `<=` contract, matching DuckDB's native
  * ASOF JOIN, which the oracle uses as the differential twin).
  *
  * Determinism contract: the right side must be unique per (key, time) —
  * pre-aggregate duplicates first (the oracle query does exactly that).
  * Left and right non-key column names must be disjoint. Right VALUE
  * columns must be non-null: `last(ignoreNulls)` is how left rows skip
  * their own padding, so a genuinely NULL right value would fall through
  * to an older right row instead of surfacing as NULL — coalesce a
  * sentinel around nullable right values before joining.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String): DataFrame = {
    val rightVals = right.columns.filter(c => c != key && c != rightTime).toIndexedSeq
    val leftCols = left.columns.filterNot(_ == key).toIndexedSeq
    require(leftCols.intersect(rightVals).isEmpty,
      s"asofJoin: overlapping column names ${leftCols.intersect(rightVals).mkString(",")}")
    // loud, not silent: a caller column named _t/_side would collide with
    // the working columns below (two _t columns → ambiguous-reference
    // AnalysisException deep in the window) — ZOrder's _zkey pattern
    require(!(left.columns ++ right.columns).exists(c => c == "_t" || c == "_side"),
      "asofJoin: input already has a _t/_side column — rename it first")

    val l = left.select(
      Seq(col(key), col(leftTime).as("_t"), lit(1).as("_side")) ++
        leftCols.map(col) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      Seq(col(key), col(rightTime).as("_t"), lit(0).as("_side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(col): _*)

    val w = Window.partitionBy(key)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1).drop("_t", "_side")
  }
}
