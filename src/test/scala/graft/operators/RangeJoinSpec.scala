package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val intervals = Seq(
    ("i1", 0.0, 10.0),
    ("i2", 5.0, 15.0),  // overlaps i1
    ("i3", 40.0, 41.0)  // much narrower than the bin width
  ).toDF("iv", "lo", "hi")

  test("points match every covering interval; boundaries are [lo, hi)") {
    val points = Seq(
      ("p_low", -1.0), ("p_zero", 0.0), ("p_both", 7.0),
      ("p_hi_edge", 10.0), ("p_gap", 20.0), ("p_narrow", 40.5), ("p_nhi", 41.0))
      .toDF("p", "x")
    val got = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", binWidth = 8.0)
      .select("p", "iv").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("p_zero", "i1"),          // lo inclusive
      ("p_both", "i1"), ("p_both", "i2"), // overlapping intervals both match
      ("p_hi_edge", "i2"),       // hi exclusive for i1, inside i2
      ("p_narrow", "i3")))       // narrow interval, bin-edge false positives filtered
  }

  test("matches equal the naive inequality join on random data") {
    val points = (1 to 300).map(i => (i.toLong, (i * 37 % 100).toDouble)).toDF("pid", "x")
    val ivs = (1 to 40).map { i =>
      val lo = (i * 13 % 90).toDouble
      (i.toLong, lo, lo + (i % 7) + 1.0)
    }.toDF("ivid", "lo", "hi")
    val fast = RangeJoin.pointInInterval(points, ivs, "x", "lo", "hi", binWidth = 5.0)
      .select("pid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(ivs,
        points("x") >= ivs("lo") && points("x") < ivs("hi"))
      .select("pid", "ivid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
    assert(fast.nonEmpty)
  }
}
