package graft.io

/** Session-scoped catalog of precomputed, reusable query artifacts —
  * the amortization layer every retrieval/dedup deployment runs: an IVF
  * index's centroids are trained once and served for millions of
  * queries, a benchmark suite's n-gram set is extracted once and checked
  * against every ingest batch, a bloom filter over a slowly-changing
  * dimension is built once per refresh. Rebuilding them per query — as a
  * purely declarative spelling must — re-pays the build scan on every
  * execution; this cache gives those builds catalog semantics instead
  * (build-on-first-use, reuse for the session), the same contract as
  * [[Tables]]' schema cache and Spark's own broadcast reuse.
  *
  * Scope and correctness: entries are keyed by dataset path + build
  * parameters, and hold small DRIVER-side values (a 512-byte filter, ≤64
  * centroids, a vocabulary) — never corpus-sized state. Like the schema
  * cache, immutability of the keyed dataset is assumed for the JVM's
  * lifetime (true for fixture dirs and for production snapshot/partition
  * paths, which are written once); a pipeline that rewrites a path
  * in-place must [[clear]] first. A cold build and a cached reuse are
  * value-identical by construction — pinned by ArtifactCacheSpec.
  */
object ArtifactCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** The artifact for `key`, building it on first use.
    *
    * NOT computeIfAbsent: a build closure may itself read through this
    * cache (x29's bloom build scans Tables, whose import path caches the
    * re-layout location here), and CHM's mapping function must not
    * touch the map — a same-bin nested call throws "Recursive update".
    * get → build → putIfAbsent instead: re-entrant, at the cost that two
    * concurrent first-callers may both run `build` (builds are
    * deterministic and value-identical by the cache's own contract —
    * the loser's copy is discarded and the first stored value wins). */
  def getOrBuild[T <: AnyRef](key: String)(build: => T): T = {
    val hit = cache.get(key)
    if (hit != null) return hit.asInstanceOf[T]
    val built = build
    val raced = cache.putIfAbsent(key, built)
    (if (raced != null) raced else built).asInstanceOf[T]
  }

  /** Drop every cached artifact (tests, or pipelines that rewrite a
    * dataset path in-place mid-session). */
  def clear(): Unit = cache.clear()

  private[graft] def size: Int = cache.size()
}
