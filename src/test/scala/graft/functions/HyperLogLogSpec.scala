package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HyperLogLogSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def sketchOf(values: Seq[String], parts: Int): Seq[Int] =
    values.toDF("v").repartition(parts)
      .agg(HyperLogLog.hllAgg(HyperLogLog.packedCell(md5(col("v")))))
      .head().getSeq[Int](0)

  test("cells are well-formed: bucket in [0,64), rho in [1,45]") {
    val cells = (1 to 1000).map(i => s"val-$i").toDF("v")
      .select(HyperLogLog.packedCell(md5(col("v"))).as("p"))
      .as[Long].collect()
    assert(cells.forall(p => p / 64 >= 0 && p / 64 < 64))
    assert(cells.forall(p => p % 64 >= 1 && p % 64 <= 45))
  }

  test("packedCellFromH60 equals packedCell on the same md5, incl. deep-zero tails") {
    // random values plus planted tails: all-zero 44 bits (rho cap 45)
    // and single-bit-at-depth patterns exercising every nibble class
    val vals = (1 to 2000).map(i => s"val-$i")
    val fromStr = vals.toDF("v")
      .select(HyperLogLog.packedCell(md5(col("v"))).as("p")).as[Long].collect()
    val fromH60 = vals.toDF("v")
      .select(HyperLogLog.packedCellFromH60(
        conv(substring(md5(col("v")), 1, 15), 16, 10).cast("long")).as("p"))
      .as[Long].collect()
    assert(fromStr.toSeq == fromH60.toSeq)
    // planted h60s: bucket bits set, tail = 0 (cap), tail = 1 (max lz),
    // tail = top-bit (lz 0)
    for ((tail, rho) <- Seq(0L -> 45L, 1L -> 44L, (1L << 43) -> 1L)) {
      val h60 = (0x2bL << 52) | (tail << 8) | 0x5aL
      assert(HllCellFromH60.compute(h60) == (0x2bL % 64) * 64 + rho, s"tail=$tail")
    }
  }

  test("estimate is within the HLL error envelope at 10k distinct") {
    val n = 10000
    val df = (1 to n).map(i => s"item-$i").toDF("v")
      .agg(HyperLogLog.hllAgg(HyperLogLog.packedCell(md5(col("v")))).as("reg"))
      .select(HyperLogLog.estimate(col("reg")).as("est"))
    val est = df.head().getDouble(0)
    // standard error 1.04/sqrt(64) ~ 13%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.4, s"estimate $est too far from $n")
  }

  test("merge is partition-independent and duplicate-insensitive") {
    val vals = (1 to 500).map(i => s"w$i")
    val one = sketchOf(vals, 1)
    val many = sketchOf(vals, 8)
    val duped = sketchOf(vals ++ vals ++ vals, 8)
    assert(one == many)
    assert(one == duped)
  }
}
