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

  private def buildLong(values: Seq[Long], parts: Int): Seq[Long] =
    values.toDF("v").repartition(parts)
      .agg(BloomFilter.bloomAggLong(col("v"))).head().getSeq[Long](0)

  test("long family: no false negatives, bounded false positives") {
    val inserted = (1L to 300L).map(_ * 7919L)
    val bits = buildLong(inserted, 8)
    def pass = {
      val (h1, h2) = BloomFilter.probeHashesLong(col("v"))
      BloomFilter.mightContainHashes(bits, h1, h2)
    }
    val misses = inserted.toDF("v").filter(!pass).count()
    assert(misses == 0)
    val probes = (1L to 2000L).map(_ * 7919L + 1L)
    val fp = probes.toDF("v").filter(pass).count()
    assert(fp < 100, s"false-positive count $fp out of 2000 is implausibly high")
  }

  test("long family: column hashes match driver arithmetic and SQL twin, incl. negatives") {
    val keys = Seq(0L, 1L, -1L, 42L, -7919L, Int.MaxValue.toLong + 5L,
      Long.MaxValue, Long.MinValue + 1)
    val (h1c, h2c) = BloomFilter.probeHashesLong(col("v"))
    val got = keys.toDF("v").select(col("v"), h1c.as("h1"), h2c.as("h2"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for (k <- keys) assert(got(k) == BloomFilter.longHashes(k), s"key $k")
    // the SQL twin (oracle spelling) through Spark's own SQL parser
    val (s1, s2) = BloomFilter.longHashesSql("v")
    val gotSql = keys.toDF("v").selectExpr("v", s"$s1 AS h1", s"$s2 AS h2")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for (k <- keys) assert(gotSql(k) == BloomFilter.longHashes(k), s"sql key $k")
  }

  test("long family: merge is partition-independent and matches bitPosLong") {
    val values = (1L to 64L).map(_ * 13L)
    val one = buildLong(values, 1)
    val many = buildLong(values, 16)
    assert(one == many)
    val expected = new Array[Long](BloomFilter.Words)
    for (v <- values; i <- 0 until BloomFilter.K) {
      val p = BloomFilter.bitPosLong(i, v)
      expected(p / 64) |= 1L << (p % 64)
    }
    assert(one == expected.toSeq)
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
