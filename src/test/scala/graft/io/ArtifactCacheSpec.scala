package graft.io

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** The artifact cache's contract: build-at-most-once per key, and —
  * the load-bearing property — a COLD build and a CACHED reuse are
  * value-identical for every query that amortizes a build through the
  * cache (x29 bloom bits, x22 benchmark grams, x21 df table, x16 IVF
  * centroids). If reuse could drift from rebuild, the bench would be
  * measuring a different query than Verify checks. */
class ArtifactCacheSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("getOrBuild builds once per key and returns the same instance") {
    ArtifactCache.clear()
    var builds = 0
    val key = "spec:build-once"
    val a = ArtifactCache.getOrBuild(key) { builds += 1; Vector(1, 2, 3) }
    val b = ArtifactCache.getOrBuild(key) { builds += 1; Vector(9, 9, 9) }
    assert(builds == 1 && (a eq b))
    ArtifactCache.clear()
    val c = ArtifactCache.getOrBuild(key) { builds += 1; Vector(4) }
    assert(builds == 2 && c == Vector(4))
    ArtifactCache.clear()
  }

  test("cold build and cached reuse produce identical results for every cache-backed query") {
    for (name <- Seq("x29_bloom_prefilter", "x22_contamination",
        "x21_tfidf_topk", "x16_ivf_topk")) {
      ArtifactCache.clear()
      val cold = SparkEntry.queries(name)(spark, sf).collect().map(_.toString)
      assert(ArtifactCache.size >= 1, s"$name no longer routes through the cache")
      val warm = SparkEntry.queries(name)(spark, sf).collect().map(_.toString)
      assert(cold.sameElements(warm), s"$name drifted between cold build and cached reuse")
    }
    ArtifactCache.clear()
  }
}
