package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CountMinSketchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val words =
    Seq.fill(10)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")

  test("estimates are exact-or-overestimates, never under (CMS bound)") {
    val sk = words.toDF("w").agg(CountMinSketch.cmsAgg(col("w")).as("sk"))
    val est = sk.select(
      CountMinSketch.estimate(col("sk"), "alpha").as("a"),
      CountMinSketch.estimate(col("sk"), "beta").as("b"),
      CountMinSketch.estimate(col("sk"), "gamma").as("c"),
      CountMinSketch.estimate(col("sk"), "absent").as("z")).head()
    assert(est.getLong(0) >= 10 && est.getLong(1) >= 3 && est.getLong(2) >= 1)
    assert(est.getLong(3) >= 0)
    // 14 tokens over 4×64 cells: collisions are possible but bounded by
    // the total count
    assert(Seq(0, 1, 2, 3).map(est.getLong).forall(_ <= words.size))
  }

  test("merge is partition-independent: 1 vs 8 partitions give the same sketch") {
    val one = words.toDF("w").coalesce(1)
      .agg(CountMinSketch.cmsAgg(col("w"))).head().getSeq[Long](0)
    val many = words.toDF("w").repartition(8)
      .agg(CountMinSketch.cmsAgg(col("w"))).head().getSeq[Long](0)
    assert(one == many)
    assert(one.sum == words.size.toLong * CountMinSketch.Depth)
  }

  test("nulls are ignored") {
    val sk = (words.map(Option(_)) :+ None).toDF("w")
      .agg(CountMinSketch.cmsAgg(col("w"))).head().getSeq[Long](0)
    assert(sk.sum == words.size.toLong * CountMinSketch.Depth)
  }
}
