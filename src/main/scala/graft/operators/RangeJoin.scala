package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — the second time/interval operator
  * Spark's join set lacks (SURVEY.md §2.4 extension note): match each
  * point p to every interval with `lo <= p < hi`.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoopJoin —
  * O(|points|×|intervals|) and a driver-memory hazard. This composition
  * BUCKETIZES instead (preference (a) of the custom-operator ladder):
  * intervals explode to the fixed-width bins they cover, points map to
  * their bin, the join is a plain equi-join on the bin id, and the exact
  * predicate filters bin-edge false positives. Each (point, interval)
  * match survives exactly once (an interval covers a bin once; a point
  * lives in one bin) — no dedup pass needed.
  *
  * Scale: one shuffle on the bin id, work ∝ |points| + Σ interval
  * spans/binWidth + |candidate pairs|. Tune binWidth toward the typical
  * interval length: too small explodes the interval side, too large
  * inflates candidate pairs per bin (and a hot bin is ordinary key skew —
  * AQE or [[Skew]] applies).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // loud, not silent: withColumn would REPLACE a caller-owned _bin and
    // the trailing drop would delete it (ZOrder's _zkey guard pattern)
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "pointInInterval: input already has a _bin column — rename it first")
    val iv = intervals.withColumn("_bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    points
      .withColumn("_bin", floor(col(pointCol) / binWidth).cast("long"))
      .join(iv, "_bin")
      .filter(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }
}
