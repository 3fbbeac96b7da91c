package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val skewed = (1 to 1000).map { i =>
    val k = if (i % 10 == 0) s"k${i % 7}" else "hot"
    (k, i.toDouble)
  }.toDF("k", "v")

  test("saltedSum equals plain aggregation on skewed keys") {
    val plain = skewed.groupBy("k").agg(sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val salted = Skew.saltedSum(skewed, Seq("k"), "v", nSalts = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join, including duplicate left rows") {
    val dupped = skewed.union(skewed.limit(50)) // duplicates must survive
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B")).toDF("k", "label")
    val plain = dupped.join(dim, Seq("k"))
      .groupBy("k", "label").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val salted = Skew.saltedJoin(dupped, dim, Seq("k"), nSalts = 8)
      .groupBy("k", "label").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(salted == plain)
  }

  test("salting actually spreads the hot key over multiple buckets") {
    val buckets = skewed.filter(col("k") === "hot")
      .withColumn("_salt", pmod(xxhash64(col("k"), col("v")), lit(8)))
      .select("_salt").distinct().count()
    assert(buckets > 4, s"hot key landed in only $buckets/8 salt buckets")
  }
}
