package graft.sources.v2

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PagedOrdersProviderSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def read(pages: Int = 8, pageSize: Int = 50, parallelism: Int = 4) =
    spark.read.format("graft.sources.v2.PagedOrdersProvider")
      .option("pages", pages.toString)
      .option("pageSize", pageSize.toString)
      .option("parallelism", parallelism.toString)
      .load()

  test("full scan fans out over partitioned page ranges and yields every row") {
    val df = read()
    assert(df.rdd.getNumPartitions == 4) // page ranges, not a driver loop
    assert(df.count() == 8L * 50)
    val ids = df.agg(min("order_id"), max("order_id")).head()
    assert(ids.getLong(0) == 0L && ids.getLong(1) == 399L)
  }

  test("order_date predicate prunes page ranges: later cutoff fetches fewer pages") {
    def pagesFetched(cutoffMinutes: Int): Long = {
      PagedOrders.PageClient.fetched.set(0)
      val cutoff = new java.sql.Timestamp(
        PagedOrders.BaseMicros / 1000 + cutoffMinutes * 60L * 1000)
      val n = read().filter(col("order_date") > lit(cutoff)).count()
      val fetched = PagedOrders.PageClient.fetched.get()
      // row-level correctness: ids are minutes, so ids > cutoffMinutes survive
      assert(n == math.max(0, 400 - cutoffMinutes - 1), s"cutoff $cutoffMinutes")
      fetched
    }
    val all = pagesFetched(0)      // prunes nothing (id 0 is not > cutoff but page 0 must be read)
    val half = pagesFetched(200)   // pages 0-3 provably empty
    val most = pagesFetched(390)   // only the last page remains
    assert(all == 8 && half == 4 && most == 1,
      s"pages fetched: all=$all half=$half most=$most")
  }

  test("scan reports post-pushdown statistics; a pruned span broadcasts with no hint") {
    // exact page-arithmetic row count reaches the optimizer
    val stats = read(pages = 64, pageSize = 50)
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(64L * 50)),
      s"expected exact numRows from page arithmetic, got ${stats.rowCount}")
    // a date-pruned span reports the PRUNED count, small enough that the
    // optimizer picks a broadcast join against a big table on stats alone
    val cutoff = new java.sql.Timestamp(
      PagedOrders.BaseMicros / 1000 + 3000L * 60 * 1000) // keeps ~4 of 64 pages
    val pruned = read(pages = 64, pageSize = 50)
      .filter(col("order_date") > lit(cutoff))
    // the residual Filter node drops rowCount under default (non-CBO)
    // estimation, so read the SCAN leaf — that is what sizes the join
    val prunedRows = pruned.queryExecution.optimizedPlan
      .collectLeaves().head.stats.rowCount
    assert(prunedRows.exists(_ <= BigInt(4L * 50)),
      s"pruned span should report the post-pushdown count, got $prunedRows")
    val big = spark.range(0, 500000).select(col("id").as("order_id"))
    val joined = big.join(pruned, Seq("order_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"pruned paged span should broadcast on statistics alone:\n$plan")
  }

  test("pushdown is visible in the plan and residual filters still apply row-level") {
    val df = read().filter(col("order_date") >
      new java.sql.Timestamp(PagedOrders.BaseMicros / 1000 + 90L * 60 * 1000))
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("GreaterThan(order_date"), scanDesc)
    // page pruning is page-granular; the boundary row inside the first
    // kept page must still be filtered out row-level
    assert(df.agg(min("order_id")).head().getLong(0) == 91L)
  }

  test("LIMIT pushdown: a small limit fetches one page of the whole space (per_page short-stop)") {
    PagedOrders.PageClient.fetched.set(0)
    val five = read(pages = 64, pageSize = 50, parallelism = 4).limit(5).collect()
    assert(five.length == 5)
    assert(PagedOrders.PageClient.fetched.get() == 1,
      s"limit(5) should fetch exactly 1 page, fetched ${PagedOrders.PageClient.fetched.get()}")
    // page-granular partial push: a limit spanning pages fetches just those
    PagedOrders.PageClient.fetched.set(0)
    val many = read(pages = 64, pageSize = 50, parallelism = 4).limit(120).collect()
    assert(many.length == 120)
    assert(PagedOrders.PageClient.fetched.get() <= 3,
      s"limit(120) at 50/page should fetch ≤3 pages, fetched ${PagedOrders.PageClient.fetched.get()}")
  }

  test("MIN/MAX/COUNT pushdown: date-bounds probes answer from pagination metadata, zero pages fetched") {
    PagedOrders.PageClient.fetched.set(0)
    val df = read(pages = 16, pageSize = 50)
      .agg(min("order_date"), max("order_date"), count(lit(1)))
    val r = df.head()
    assert(PagedOrders.PageClient.fetched.get() == 0,
      s"pushed aggregate must fetch no pages, fetched ${PagedOrders.PageClient.fetched.get()}")
    // values equal the full-scan answers (checked against the generator's
    // own arithmetic: ids 0..799, one minute apart)
    val lastId = 16L * 50 - 1
    assert(r.getTimestamp(0).getTime == PagedOrders.BaseMicros / 1000)
    assert(r.getTimestamp(1).getTime ==
      (PagedOrders.BaseMicros + lastId * PagedOrders.MicrosPerOrder) / 1000)
    assert(r.getLong(2) == 800L)
    // and the plan shows the scan, not a shuffling aggregate over it
    assert(df.queryExecution.executedPlan.toString.contains("agg=Some"),
      df.queryExecution.executedPlan.toString)
    // a filtered probe must NOT complete-push (filters stay residual):
    // it degrades to the page-pruned scan and still answers correctly
    PagedOrders.PageClient.fetched.set(0)
    val cutoff = new java.sql.Timestamp(
      PagedOrders.BaseMicros / 1000 + 500L * 60 * 1000)
    val fr = read(pages = 16, pageSize = 50)
      .filter(col("order_date") > lit(cutoff))
      .agg(count(lit(1))).head()
    assert(fr.getLong(0) == 800L - 500L - 1L)
    assert(PagedOrders.PageClient.fetched.get() > 0, "filtered probe should scan pages")
  }

  test("LIMIT pushdown survives Int.MaxValue (no overflow truncation) and an empty span answers NULL/0") {
    // a limit at the Int ceiling must return EVERY row, not wrap
    // negative and silently serve one page
    assert(read(pages = 8, pageSize = 50).limit(Int.MaxValue).count() == 400L)
    // complete-pushed aggregates over zero pages: SQL semantics, not
    // fabricated bounds from the arithmetic
    val r = read(pages = 0, pageSize = 50)
      .agg(min("order_id"), max("order_date"), count(lit(1))).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getLong(2) == 0L, r.toString)
  }

  test("column pruning reaches the reader: only requested fields are materialized") {
    val df = read().select("status")
    val plan = df.queryExecution.executedPlan.toString
    val readSchemaLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse(plan)
    assert(readSchemaLine.contains("status") && !readSchemaLine.contains("order_date"),
      readSchemaLine)
    assert(df.distinct().count() == 2) // completed / refunded
  }

  test("order_date pushdown also prunes with java.time.Instant cutoffs (java8API on)") {
    val key = "spark.sql.datetime.java8API.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "true")
    try {
      PagedOrders.PageClient.fetched.set(0)
      val cutoff = java.time.Instant.ofEpochSecond(
        PagedOrders.BaseMicros / 1000000L + 200L * 60)
      val n = read().filter(col("order_date") > lit(cutoff)).count()
      assert(n == 400 - 200 - 1)
      // with Instant matched in pushFilters, pages 0-3 are provably empty
      // and never fetched; before the fix this silently degraded to 8
      assert(PagedOrders.PageClient.fetched.get() == 4,
        s"pages fetched: ${PagedOrders.PageClient.fetched.get()}")
    } finally spark.conf.set(key, prev)
  }

  test("transient page failure retries that page alone and the scan succeeds") {
    PagedOrders.PageClient.fetched.set(0)
    PagedOrders.PageClient.failOnce.add(3)
    try {
      val df = spark.read.format("graft.sources.v2.PagedOrdersProvider")
        .option("pages", "8").option("pageSize", "50")
        .option("parallelism", "4").option("retryDelayMs", "0")
        .load()
      // count() would complete-push to page arithmetic (zero fetches)
      // since the aggregate pushdown landed — materialize actual rows
      assert(df.collect().length == 8 * 50)
      // 8 pages + 1 refetch of the failed page; a task-level retry would
      // have refetched the whole 2-page range
      assert(PagedOrders.PageClient.fetched.get() == 9)
    } finally PagedOrders.PageClient.failOnce.clear()
  }

  test("permanently failing page exhausts retries and fails the read (S2)") {
    PagedOrders.PageClient.failAlways.add(5)
    try {
      val df = spark.read.format("graft.sources.v2.PagedOrdersProvider")
        .option("pages", "8").option("pageSize", "50")
        .option("parallelism", "4").option("retryDelayMs", "0")
        .option("retries", "1")
        .load()
      // collect(), not count(): a pushed COUNT never touches the pages
      val e = intercept[org.apache.spark.SparkException] { df.collect() }
      assert(e.getCause != null || e.getMessage.contains("permanent"),
        s"unexpected failure shape: $e")
    } finally PagedOrders.PageClient.failAlways.clear()
  }

  test("aggregates over the connector match the generator's closed form") {
    val df = read(pages = 4, pageSize = 25)
    val total = df.agg(sum("order_id")).head().getLong(0)
    assert(total == (0L until 100L).sum)
  }
}
