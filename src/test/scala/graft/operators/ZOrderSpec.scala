package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference Morton implementation (bit-by-bit, independent spelling). */
  private def morton(a: Long, b: Long): Long = {
    val (ua, ub) = (a & 0xffffL, b & 0xffffL)
    (0 until 16).map { i =>
      (((ua >> i) & 1L) << (2 * i)) | (((ub >> i) & 1L) << (2 * i + 1))
    }.sum
  }

  test("interleave16 equals the reference Morton key (incl. masking and nulls)") {
    val rnd = new scala.util.Random(7)
    val cases = Seq.fill(200)((rnd.nextLong().abs, rnd.nextLong().abs)) ++
      Seq((0L, 0L), (0xffffL, 0xffffL), (1L, 0L), (0L, 1L), (70000L, 3L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.interleave16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map { case (a, b) => morton(a, b) })
    // null dims behave as 0 (layout keys must be total)
    val z = Seq((Option.empty[Long], Some(5L))).toDF("a", "b")
      .select(ZOrder.interleave16(col("a"), col("b"))).head().getLong(0)
    assert(z == morton(0L, 5L))
  }

  test("z-neighbors: key is monotonic along each axis from a fixed corner") {
    // along each single axis (other held at 0) the morton key must be
    // strictly increasing — interleaving never reorders a 1-D walk.
    // Driven through the PRODUCTION column expression (interleave16),
    // not the spec's local morton() — the equality test already ties the
    // two together; this must hold of the shipped key on its own.
    val axis = (0L until 100L)
    def keys(f: Long => (Long, Long)): Seq[Long] = {
      val rows = axis.map(f)
      rows.toDF("a", "b")
        .select(ZOrder.interleave16(col("a"), col("b")).as("z"))
        .collect().map(_.getLong(0)).toSeq
    }
    val alongA = keys(v => (v, 0L))
    val alongB = keys(v => (0L, v))
    assert(alongA == alongA.sorted && alongA.distinct == alongA)
    assert(alongB == alongB.sorted && alongB.distinct == alongB)
  }

  test("layoutBy plans a range exchange on the z-key and an in-partition sort") {
    val df = (1L to 1000L).map(i => (i, i % 37, i % 11)).toDF("id", "d1", "d2")
    val plan = ZOrder.layoutBy(df, col("d1"), col("d2"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(_zkey"))
    assert(plan.contains("Sort [_zkey"))
    // layout, not a query: no global sort (the Sort must be non-global)
    assert(!plan.contains("Sort [_zkey#" ) || !plan.matches("(?s).*Sort \\[_zkey[^\\n]*, true,.*"),
      "in-partition sort must not be global")
  }
}
