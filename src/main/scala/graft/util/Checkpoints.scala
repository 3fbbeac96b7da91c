package graft.util

/** Immediate storage-block release for localCheckpoint-backed frames.
  *
  * `Dataset.unpersist` only drops CacheManager-registered plans — it
  * CANNOT release a localCheckpoint's RDD blocks, which otherwise wait
  * for the ContextCleaner to notice the RDD was garbage-collected
  * (eventual, GC-driven — the r17 reclamation finding). Iterative
  * algorithms that checkpoint per round (connected components) and the
  * artifact cache's eviction path both want the blocks gone NOW: this
  * walks the frame's analyzed plan for `LogicalRDD` nodes (the shape
  * every `localCheckpoint()` result has — possibly under projections)
  * and unpersists their RDDs directly.
  *
  * Call ONLY on frames that will never be read again: a released
  * checkpoint has no lineage to recompute from, so a later action on it
  * fails with a missing-block error — which is the correct loud outcome
  * for a use-after-release bug, not a silent recompute. */
object Checkpoints {
  /** Deep release: unpersists EVERY LogicalRDD in the plan. Only for
    * callers that EXCLUSIVELY own all checkpoints reachable from `ds`
    * (the CC rounds: each round's checkpoint feeds only the next). A
    * frame DERIVED from a shared checkpoint (an ArtifactCache entry
    * built over another entry's handle) must use [[releaseRoot]] — deep
    * release here would strand the sibling entry on missing blocks. */
  def release(ds: org.apache.spark.sql.Dataset[_]): Unit =
    try ds.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Release ONLY a checkpoint HANDLE's own blocks: unpersists the
    * LogicalRDD when it is the plan's ROOT (the shape every
    * `localCheckpoint()` result has). A derived frame — whose plan
    * merely CONTAINS someone else's checkpoint — is left alone, so
    * evicting it can never strand a still-served upstream artifact. */
  def releaseRoot(ds: org.apache.spark.sql.Dataset[_]): Unit =
    try ds.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    } catch { case scala.util.control.NonFatal(_) => () }
}
