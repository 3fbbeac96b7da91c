package graft.io

import org.apache.spark.sql.{DataFrame, Row}

/** Measured-size regime dispatch for dual-regime query sites.
  *
  * Several operators have two legitimate physical shapes: a driver-side
  * artifact when the derived state is provably small (an LSH candidate
  * list on a deduplicated snapshot, a bounded vocabulary) and a fully
  * distributed frame when it is not (a 100 TB web corpus's candidate set
  * or term vocabulary is billions of rows — "pair participants only"
  * does not make it driver-small). The choice must be made by MEASURED
  * size, not assumption: [[collectIfSmall]] probes the frame with a
  * `limit(bound + 1)` collect — one job either way, and in the
  * under-bound case the probe IS the complete result set (a limit above
  * the true row count returns every row) — and returns `None` above the
  * bound, telling the site to serve the distributed plan instead.
  *
  * The bound is rows, not bytes, because the gated artifacts are
  * fixed-width rows (id pairs, (term, count)); `graft.regime
  * .collectMaxRows` overrides it (specs plant a tiny bound to force the
  * distributed regime on fixture data — RegimeSpec). Decisions are
  * recorded per key for test observability.
  */
object Regime {
  /** Row bound for "driver-small", sized to AGREE with
    * [[ArtifactCache.maxBytes]]: 2^13 rows at ≤~100 bytes of estimated
    * row width stays under the ~1 MB cache cap, so a Regime-collected
    * artifact is always storable — a larger bound would admit artifacts
    * the cache then rejects, paying the driver collect per use while
    * losing all amortization (worst of both regimes). Independently,
    * driver-local relations past ~10-20k rows LOSE to recomputation
    * anyway: per-construction plan encoding of the literal rows costs
    * more than the distributed build they save (measured on x30's
    * 20k-row band index, round 6). */
  def collectMaxRows: Int =
    sys.props.get("graft.regime.collectMaxRows").map(_.toInt).getOrElse(1 << 13)

  /** Last dispatch decision per artifact key ("collected" |
    * "distributed") — spec observability, never control flow. */
  private[graft] val lastDecision =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** True when a cached frame handle can serve session `s`: its blocks
    * and RDDs belong to s's live SparkContext. The ArtifactCache is
    * JVM-global while frames are context-scoped — a handle cached by a
    * stopped (or different) context would fail every consumer with
    * "SparkContext has been shut down"; sites must invalidate and
    * rebuild instead (frames from sibling sessions of the SAME context
    * are fine: checkpoint/persist blocks are context-owned). */
  def servable(frame: org.apache.spark.sql.Dataset[_],
      s: org.apache.spark.sql.SparkSession): Boolean =
    (frame.sparkSession.sparkContext eq s.sparkContext) &&
      !s.sparkContext.isStopped

  /** The complete rows of `df` iff it holds at most [[collectMaxRows]]
    * of them, else `None`. The over-bound probe still computes the
    * frame (aggregation forces it) but transfers only bound+1 rows —
    * the driver never holds the oversized artifact. */
  def collectIfSmall(key: String, df: DataFrame): Option[IndexedSeq[Row]] = {
    val bound = collectMaxRows
    val probe = df.limit(bound + 1).collect()
    // both arbiters must agree: the row bound (cheap, pre-sized) AND the
    // cache's own byte estimate — rows wide enough to bust the byte cap
    // (long terms, big structs) dispatch distributed instead of
    // collecting per use and never caching (the worst-of-both trap)
    val fits = probe.length <= bound &&
      ArtifactCache.roughBytes(probe) <= ArtifactCache.maxBytes
    lastDecision.put(key, if (fits) "collected" else "distributed")
    if (fits) Some(probe.toIndexedSeq) else None
  }
}
