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
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
