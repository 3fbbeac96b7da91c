package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val quotes = Seq(
    ("A", 10L, 1.0),
    ("A", 20L, 2.0),
    ("B", 15L, 9.0)).toDF("k", "qt", "qv")

  test("each left row gets the latest right row at or before its time") {
    val trades = Seq(
      ("A", 5L),  // before any quote → NULL
      ("A", 10L), // tie → matches the 10 quote (<= contract)
      ("A", 19L), // between → 10 quote
      ("A", 25L), // after both → 20 quote
      ("B", 14L), // before B's quote → NULL
      ("C", 50L)  // key with no quotes at all → NULL
    ).toDF("k", "tt")
    val got = AsofJoin.asofJoin(trades, quotes, "k", "tt", "qt")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      ("A", 5L, null), ("A", 10L, 1.0), ("A", 19L, 1.0), ("A", 25L, 2.0),
      ("B", 14L, null), ("C", 50L, null)))
  }

  test("duplicate left timestamps all see the same right row") {
    val trades = Seq(("A", 12L), ("A", 12L)).toDF("k", "tt")
    val got = AsofJoin.asofJoin(trades, quotes, "k", "tt", "qt")
      .collect().map(r => r.getDouble(2)).toSeq
    assert(got == Seq(1.0, 1.0))
  }

  test("overlapping non-key column names are rejected") {
    val bad = quotes.withColumnRenamed("qv", "tt")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(Seq(("A", 1L)).toDF("k", "tt"), bad, "k", "tt", "qt")
    }
    assert(e.getMessage.contains("overlapping"))
  }
}
