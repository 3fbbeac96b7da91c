package graft.ext

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** x51 (Jelinek-Mercer interpolated bigram surprisal) semantics beyond
  * the DuckDB oracle row: the cross-query artifact composition (x51
  * composes x45's bigram table and x41's unigram table — whichever ran
  * first, the other serves the SAME cached artifact, value-identically)
  * and the smoothing property the interpolation exists for. */
class InterpNllSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String): Map[Long, (Long, Long, Double)] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("x51 serves identically whether its gram artifacts are cold-built or inherited from x45/x41") {
    graft.io.ArtifactCache.clear()
    val cold = rows("x51_interp_nll") // builds both tables itself
    graft.io.ArtifactCache.clear()
    rows("x45_bigram_nll") // leaves the bigram (and unigram) artifacts
    rows("x41_unigram_nll")
    val warm = rows("x51_interp_nll") // must serve the cached tables
    assert(warm == cold,
      "x51 drifted between cold-built and x45/x41-inherited artifacts")
    graft.io.ArtifactCache.clear()
    rows("x51_interp_nll") // x51 first this time
    val x45AfterX51 = rows("x45_bigram_nll")
    graft.io.ArtifactCache.clear()
    val x45Cold = rows("x45_bigram_nll")
    assert(x45AfterX51 == x45Cold,
      "x45 drifted when serving the bigram artifact x51 built")
    graft.io.ArtifactCache.clear()
  }

  test("interpolation smooths: per-doc x51 surprisal never exceeds x45's raw bigram surprisal beyond quantization slack") {
    // P_JM = (p_bi + p_uni)/2 ≥ p_bi/2, so true interpolated surprisal
    // ≤ raw bigram surprisal + 1 bit; the integer bit-length
    // quantization adds at most one more bit of slack per side.
    graft.io.ArtifactCache.clear()
    val raw = rows("x45_bigram_nll")
    val interp = rows("x51_interp_nll")
    assert(interp.keySet == raw.keySet,
      "x51 and x45 disagree on which docs carry bigram evidence")
    interp.foreach { case (doc, (n, _, nll51)) =>
      val (n45, _, nll45) = raw(doc)
      assert(n == n45, s"doc $doc bigram counts differ: x51=$n x45=$n45")
      assert(nll51 >= 0.0, s"doc $doc negative interpolated surprisal $nll51")
      assert(nll51 <= nll45 + 2.0 + 1e-9,
        s"doc $doc interpolated surprisal $nll51 exceeds raw $nll45 + slack — " +
          "the unigram mix must only ever LOWER the bigram surprisal")
    }
    graft.io.ArtifactCache.clear()
  }
}
