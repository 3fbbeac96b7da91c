package graft.ext

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** BM25 ranked retrieval (x47) semantics beyond the DuckDB oracle row:
  * retrieval-shape invariants that must hold for ANY corpus, plus the
  * exact-sum discipline (the quantized-long score is deterministic
  * across runs — a float sum over terms would not be). */
class Bm25Spec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(): Seq[Row] =
    SparkEntry.queries("x47_bm25_topk")(spark, sf).collect().toSeq

  test("x47: query set, rank shape, monotone scores, self-retrieval, determinism") {
    val rows = run()
    val byQuery = rows.groupBy(_.getLong(0))
    // query set = the deterministic probe docs (doc_id % 200 == 7)
    assert(byQuery.keySet == Set(7L, 207L, 407L))
    byQuery.foreach { case (q, rs) =>
      // exactly k results, ranked 1..k in output order
      assert(rs.map(_.getInt(1)).toSeq == (1 to 10),
        s"query $q rank sequence broken")
      // scores non-increasing down the ranking (ties broken by doc_id,
      // which the quantized integer score makes exact, not ulp-lucky)
      val scores = rs.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q scores not monotone: ${scores.mkString(",")}")
      // "more-like-this" sanity: the probe document itself — which
      // contains every query term by construction — retrieves into its
      // own top-10 (not necessarily rank 1: the 31-word fixture
      // vocabulary lets shorter/denser docs outscore it under length
      // normalization, which is BM25 doing its job)
      assert(rs.exists(_.getLong(2) == q),
        s"query $q did not retrieve its own probe document in the top 10")
    }
    // exact integer aggregation ⇒ bit-identical rerun (a double sum over
    // query terms would drift with aggregation order)
    assert(run().map(_.toString) == rows.map(_.toString),
      "x47 rerun drifted — score aggregation is not order-independent")
  }

  test("x47: quantized score reconstructs from the 2^20 grid") {
    // every served score is an exact multiple of 2^-20: the sum ran in
    // integer space and the final division is exact below 2^53
    run().foreach { r =>
      val s = r.getDouble(3)
      val q = s * 1048576.0
      assert(q == math.rint(q), s"score $s is off the 2^-20 grid")
    }
  }

  private def runRrf(): Seq[Row] =
    SparkEntry.queries("x48_rrf_fusion")(spark, sf).collect().toSeq

  test("x48: rank shape, monotone fused scores, RRF bounds, determinism") {
    val rows = runRrf()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(7L, 207L, 407L))
    // RRF contribution of rank r in one run, on the 2^30 grid
    def c(r: Int): Long = math.floor(1073741824.0 / (60.0 + r)).toLong
    byQuery.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).toSeq == (1 to 10),
        s"query $q rank sequence broken")
      val scores = rs.map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q fused scores not monotone")
      // bounds from the formula itself: a doc ranked in BOTH runs at
      // best contributes 2·c(1); a doc ranked in one run at worst (20)
      // contributes c(20) — every served score lies in [c(20), 2·c(1)]
      rs.foreach { r =>
        val rrfQ = math.rint(r.getDouble(3) * 1073741824.0).toLong
        assert(rrfQ >= c(20) && rrfQ <= 2 * c(1),
          s"query $q doc ${r.getLong(2)} fused score $rrfQ outside " +
            s"[${c(20)}, ${2 * c(1)}]")
        // every fused integer must decompose as c(r1) [+ c(r2)] for
        // ranks in 1..20 — the score can only be built from real rank
        // contributions
        val singles = (1 to 20).map(c).toSet
        val ok = singles.contains(rrfQ) ||
          (1 to 20).exists(a => singles.contains(rrfQ - c(a)))
        assert(ok, s"query $q fused score $rrfQ is not a 1- or 2-rank " +
          "RRF sum — fusion arithmetic drifted")
      }
    }
    // exact integer fusion ⇒ bit-identical rerun
    assert(runRrf().map(_.toString) == rows.map(_.toString),
      "x48 rerun drifted — fusion is not order-independent")
  }
}
