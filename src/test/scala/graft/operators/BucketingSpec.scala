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

  test("bucket pruning: an equality predicate on the bucket key scans one bucket of files (k9 pruned read)") {
    // the read-side payoff of the k9 layout beyond exchange-free joins:
    // a point predicate on the bucket key prunes the scan to the one
    // bucket that can hold it — visible in the scan's own accounting
    val df = (1L to 4000L).map(i => (i % 256, i)).toDF("k", "v")
    Bucketing.writeBucketed(df, "b_prune", "k", 4)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevAuto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // a filter-only query has no join/agg to co-locate, so the planner's
    // DisableUnnecessaryBucketedScan rule would turn the bucketed scan
    // off — and bucket PRUNING with it; pin the scan on to measure it
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("b_prune").filter(col("k") === 7)
      assert(q.count() == df.filter(col("k") === 7).count())
      q.collect()
      val scan = q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
      assert(scan.toString.contains("SelectedBucketsCount: 1 out of 4"),
        s"bucket pruning not applied:\n${scan.toString.linesIterator.take(8).mkString("\n")}")
      // realized: the scan emits only the selected bucket's rows (the
      // numFiles metric reports the pre-prune listing, so measure rows)
      val scanned = scan.metrics("numOutputRows").value
      assert(scanned > 0 && scanned <= 1600,
        s"pruned scan should read ~1 bucket's rows (hash-skewed ≈28% of 4000), read $scanned")
      info(s"bucket-pruned read: $scanned of 4000 rows via 1 of 4 buckets")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
      spark.sql("DROP TABLE IF EXISTS b_prune")
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
