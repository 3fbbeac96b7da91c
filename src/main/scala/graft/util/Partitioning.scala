package graft.util

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for compute-heavy pipelines. */
object Partitioning {

  /** Fan a degenerate low-partition input out to the session's default
    * parallelism before compute-heavy per-row work (hashing, shingling,
    * regex, vector math).
    *
    * At production scale a table is many files / many row groups and the
    * scan parallelizes natively — then this is a NO-OP (the guard sees
    * enough partitions and adds nothing to the plan). The repartition only
    * fires for degenerate sources — e.g. a single small file with one row
    * group, which Spark cannot split, serializing every fused downstream
    * operator on one core. The shuffle it inserts is bounded by the tiny
    * input that triggered it.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // The degeneracy check reads the INPUT FILE LIST, not
    // rdd.getNumPartitions: the partition count forces full physical
    // planning (+ RDD DAG construction) of the sub-frame on EVERY query
    // construction — measured 0.1-0.15 s per fanOut call at round 6,
    // the dominant plan-time cost of the fanOut queries — while the
    // file list resolves from Spark's session-cached file index without
    // planning. The file count is a HEURISTIC for scan parallelism
    // (Spark's bin-packing sizes splits to defaultParallelism, so on
    // the bench host files ≈ partitions), with two documented edges:
    // a single SPLITTABLE multi-row-group file repartitions although
    // the scan would parallelize (bounded cost, and fanOut's contract
    // already restricts it to pipelines where per-row compute dwarfs
    // one row's shuffle), and a caller-derived frame whose shuffle
    // output was coalesced still reports its source's files — wrap the
    // SOURCE, not a post-exchange frame (every in-tree call site does).
    // Non-file sources (in-memory relations — empty file list) keep the
    // exact partition check.
    val files = df.inputFiles.length
    if (files == 0) {
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    } else if (files < math.max(target / 2, 2)) df.repartition(target)
    else df
  }

  /** Globally-ordered, parallelism-pinned layout for queries that run an
    * expensive per-row projection and return rows ordered by `keys`:
    * range-repartition on the keys, sort within partitions, and only THEN
    * project (callers `.select` on the result).
    *
    * This replaces a trailing `.orderBy` after the projection, which pays
    * twice at any scale: the range partitioner samples boundaries by
    * re-executing its child (the projection runs twice), and AQE
    * coalesces the small post-sort stage so the projection also loses its
    * parallelism. Sampling here touches only the narrow source rows, the
    * projection runs exactly once, and the explicit partition count is
    * exempt from AQE coalescing (measured on a regex projection:
    * 0.79 s → 0.24 s at sf0.1). The plan is the same
    * Exchange(rangepartitioning) + per-partition Sort that `.orderBy`
    * produces — total output order is identical. */
  def orderedFanOut(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame =
    df.repartitionByRange(
        df.sparkSession.sparkContext.defaultParallelism, keys: _*)
      .sortWithinPartitions(keys: _*)
}
