package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("same-bucketed fact tables join with no exchange (co-located join)") {
    val items = (1L to 2000L).map(i => (i % 500, i, (i % 97).toDouble)).toDF("order_id", "line_id", "amount")
    val orders = (0L until 500L).map(i => (i, s"st${i % 3}")).toDF("order_id", "status")
    Bucketing.writeBucketed(items, "b_items", "order_id", 4)
    Bucketing.writeBucketed(orders, "b_orders", "order_id", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle-join path
    try {
      val joined = spark.table("b_items")
        .join(spark.table("b_orders"), "order_id")
        .groupBy("status").agg(sum("amount").as("total"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      // the join consumes the bucketed layout directly: NO exchange on
      // the join key anywhere (the only shuffle left is the groupBy on
      // status above the join)
      assert(!plan.contains("Exchange hashpartitioning(order_id"),
        s"bucketed join still shuffles on the join key:\n$plan")
      // and it is correct
      val total = joined.agg(sum("total")).head().getDouble(0)
      val expected = items.agg(sum("amount")).head().getDouble(0)
      assert(total == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_items")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("footerRowCount matches count() and runs zero Spark jobs (k9 staleness probe)") {
    val df = (1L to 1234L).map(i => (i, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(df, "b_footer", "k", 4)
    try {
      val t = spark.table("b_footer")
      val expected = t.count()
      val sc = spark.sparkContext
      sc.setJobGroup("footer-probe", "k9 staleness probe must be scan-free")
      val got = Bucketing.footerRowCount(t)
      sc.clearJobGroup()
      assert(got == expected && got == 1234L)
      // a scan would surface here as a job in the probe's group (the
      // status store updates async — give the bus a beat to drain)
      Thread.sleep(500)
      assert(sc.statusTracker.getJobIdsForGroup("footer-probe").isEmpty,
        "footerRowCount ran a Spark job — the staleness probe is scanning")
    } finally spark.sql("DROP TABLE IF EXISTS b_footer")
  }
}
