package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomFilterSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def build(values: Seq[String], parts: Int): Seq[Long] =
    values.toDF("v").repartition(parts)
      .agg(BloomFilter.bloomAgg(col("v"))).head().getSeq[Long](0)

  test("no false negatives: every inserted value passes mightContain") {
    val values = (1 to 300).map(i => s"key-$i")
    val bits = build(values, 8)
    val misses = values.toDF("v")
      .filter(!BloomFilter.mightContain(bits, col("v"))).count()
    assert(misses == 0)
  }

  test("false-positive rate is bounded at moderate fill") {
    val inserted = (1 to 300).map(i => s"key-$i")
    val bits = build(inserted, 4)
    // 300 keys × 4 hashes over 4096 bits → ~25% fill, FP ≈ fill^4 ≈ 0.4%
    val probes = (1 to 2000).map(i => s"absent-$i")
    val fp = probes.toDF("v")
      .filter(BloomFilter.mightContain(bits, col("v"))).count()
    assert(fp < 100, s"false-positive count $fp out of 2000 is implausibly high")
  }

  test("merge is partition-independent and matches the driver-side bit family") {
    val values = (1 to 64).map(i => s"w$i")
    val one = build(values, 1)
    val many = build(values, 16)
    assert(one == many)
    val expected = new Array[Long](BloomFilter.Words)
    for (v <- values; i <- 0 until BloomFilter.K) {
      val p = BloomFilter.bitPos(i, v)
      expected(p / 64) |= 1L << (p % 64)
    }
    assert(one == expected.toSeq)
  }
}
