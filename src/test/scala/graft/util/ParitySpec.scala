package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the fast floor-micros spelling of [[Parity.moneySum]] to the
  * reference DECIMAL(24,6)-cast spelling it replaced. The floor path is
  * only exact because money inputs approximate ≤6-decimal quantities
  * (see the moneySum scaladoc); this spec exercises that envelope with
  * randomized 2-decimal amounts, 2-decimal rate factors, negatives,
  * NULLs, and triple products, and must stay green if either spelling
  * changes. */
class ParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The replaced spelling: per-row DECIMAL(24,6) HALF_UP cast, long sum. */
  private def decimalMoneySum(c: org.apache.spark.sql.Column) =
    (sum((c.cast("decimal(24,6)") * lit(1000000)).cast("long"))
      .cast("decimal(38,0)") * lit(new java.math.BigDecimal("0.000001")))
      .cast("double")

  private lazy val money = {
    val rnd = new scala.util.Random(42)
    // 2-decimal amounts in [-1e6, 1e6], 2-decimal rates in [0,1]
    val rows = Seq.tabulate(20000) { i =>
      val amt = math.rint(rnd.nextDouble() * 2e8 - 1e8) / 100.0
      val disc = math.rint(rnd.nextDouble() * 100) / 100.0
      val tax = math.rint(rnd.nextDouble() * 100) / 100.0
      (i % 7, if (i % 97 == 0) None else Some(amt), disc, tax)
    }
    rows.toDF("g", "amt", "disc", "tax").persist()
  }

  test("moneySum matches the decimal-cast spelling on randomized money data") {
    for (
      e <- Seq(
        col("amt"),
        col("amt") * (lit(1.0) - col("disc")),
        col("amt") * (lit(1.0) - col("disc")) * (lit(1.0) + col("tax")))
    ) {
      val got = money.groupBy("g")
        .agg(Parity.moneySum(e).as("fast"), decimalMoneySum(e).as("ref"))
        .filter(!(col("fast") <=> col("ref")))
        .count()
      assert(got === 0L)
    }
  }

  test("per-row floor micros equal the decimal cast exactly") {
    val mismatches = money
      .filter(col("amt").isNotNull)
      .filter(
        floor(col("amt") * lit(1000000.0) + lit(0.5)) =!=
          (col("amt").cast("decimal(24,6)") * lit(1000000)).cast("long"))
      .count()
    assert(mismatches === 0L)
  }

  test("moneySum0 returns 0.0 on an empty and on an all-NULL set") {
    val empty = money.filter(lit(false))
      .agg(Parity.moneySum0(col("amt")).as("s")).head().getDouble(0)
    assert(empty === 0.0)
    val allNull = money.filter(col("amt").isNull)
      .agg(Parity.moneySum0(col("amt")).as("s")).head().getDouble(0)
    assert(allNull === 0.0)
  }
}
