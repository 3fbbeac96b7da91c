package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the multi-dimensional clustering used
  * by lakehouse OPTIMIZE/ZORDER commands: interleave the bits of two
  * dimension keys so that rows close in BOTH dimensions land close in
  * the one-dimensional sort order. Written this way, a table's file and
  * row-group min/max ranges are tight in every z-ordered dimension at
  * once, so predicates on ANY of them prune the scan — a plain sort
  * gives that for its leading column only.
  *
  * At 100 TB this is a write-time layout choice, not a query operator:
  * `layoutBy` range-partitions by the z-key (so files own contiguous
  * z-ranges) and sorts within partitions before a write. The key itself
  * is pure integer bit arithmetic — codegen'd column expressions, no
  * UDF, and exactly reproducible in any engine (the k10_zorder_key
  * oracle rebuilds it in SQL).
  */
object ZOrder {

  /** 32-bit Morton key of two dimensions, each clamped into [0, 2¹⁶):
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Inputs are
    * masked to their low 16 bits after a null→0 coalesce (layout keys
    * must be total). */
  def interleave16(a: Column, b: Column): Column = {
    val ua = coalesce(a.cast("long"), lit(0L)).bitwiseAND(lit(0xffffL))
    val ub = coalesce(b.cast("long"), lit(0L)).bitwiseAND(lit(0xffffL))
    (0 until 16).map { i =>
      shiftleft(shiftright(ua, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ub, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-ordered layout: range-partition by the Morton key of (d1, d2) and
    * sort within partitions — the shape to put in front of a warehouse
    * write so downstream scans prune on either dimension. The z-key
    * column is dropped from the result. `numFiles` sizes the range
    * partitioning (0 = session default); at scale pick it so files land
    * in the 100-500 MB band, same rule as bucket counts. The resulting
    * skip ratio is pinned end-to-end in ZOrderSpec via [[Layout]]'s
    * footer-stats evaluator plus the scan's own row metrics. */
  def layoutBy(df: DataFrame, d1: Column, d2: Column, numFiles: Int = 0): DataFrame = {
    // loud, not silent: withColumn would overwrite (and drop below) a
    // caller's own _zkey column
    require(!df.columns.contains("_zkey"),
      "layoutBy: input already has a _zkey column")
    val keyed = df.withColumn("_zkey", interleave16(d1, d2))
    val ranged =
      if (numFiles > 0) keyed.repartitionByRange(numFiles, col("_zkey"))
      else keyed.repartitionByRange(col("_zkey"))
    ranged.sortWithinPartitions("_zkey").drop("_zkey")
  }
}
