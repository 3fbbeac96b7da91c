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
