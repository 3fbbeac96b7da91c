package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key mitigation for shuffles — the hand-rolled complement to AQE's
  * skew-join splitting, for when skew is known ahead of time (a handful
  * of mega-customers, a null-heavy foreign key) or the operator is an
  * aggregation (which AQE skew handling does not cover).
  *
  * Salting is content-deterministic here (xxhash64 of the row's columns
  * mod nSalts, never a RNG): the same input always produces the same
  * intermediate partitioning, keeping runs reproducible and retries
  * safe. Correctness does not depend on the salt distribution — only the
  * balance does.
  */
object Skew {

  private def saltCol(df: DataFrame, nSalts: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(nSalts))

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt) — hot keys spread over nSalts reducers — then final
    * aggregate on key. sum/count re-aggregate losslessly; extend with
    * algebraic pairs (sum,count)→avg as needed.
    *
    * Note Spark's hash aggregation already does map-side partial combine,
    * which absorbs MOST skew; explicit salting matters when the partial
    * aggregate itself can't compress (high-cardinality sub-keys, e.g.
    * collect-distinct-ish shapes) or the hot key exceeds one reducer's
    * memory. */
  def saltedSum(
      df: DataFrame, keys: Seq[String], valueCol: String, nSalts: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    require(!df.columns.contains("_salt"),
      "saltedAgg: input already has a _salt column — rename it first")
    df.withColumn("_salt", saltCol(df, nSalts))
      .groupBy((keyCols :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }

  /** Skew-safe equi-join of a skewed LEFT fact against a small-ish RIGHT
    * side: each left row gets one deterministic salt in [0, nSalts); the
    * right side is exploded nSalts× so every (key, salt) bucket finds its
    * match. The hot key's rows land on nSalts reducers instead of one.
    * Right-side duplication is the price — keep nSalts modest and the
    * right side dimension-sized. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      nSalts: Int = 16): DataFrame = {
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "saltedJoin: an input already has a _salt column — rename it first")
    val l = left.withColumn("_salt", saltCol(left, nSalts))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
