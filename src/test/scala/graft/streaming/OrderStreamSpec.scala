package graft.streaming

import graft.{Run, SparkTestSession}
import graft.sources.WooFixtureApi
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** End-to-end: the streaming ETL (file-source order JSON → foreachBatch
  * normalize/enrich/upsert) must produce a warehouse EQUAL to the batch
  * CLI twin fed the same orders, and absorb a replayed (re-delivered)
  * file without changing state — §2.8's "foreachBatch + idempotent
  * overwrite" row proven with executed code, not doc claims. */
class OrderStreamSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val data = "/root/testdata/sf0.001"

  private def tableRows(path: String): Seq[String] = {
    val df = spark.read.parquet(path)
    df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      .collect().map(_.toString).toSeq.sorted
  }

  test("stream-ingested warehouse equals the batch run's; a replayed file is absorbed") {
    // same order set for both paths: everything since 2001-06-01
    val jsons = WooFixtureApi.orderJsonsSince(spark, data, "2001-06-01 00:00:00")
    assert(jsons.nonEmpty)

    // ---- batch reference warehouse, via the CLI twin's own pipeline
    val whBatch = Files.createTempDirectory("graft-wh-batch").toString
    val (nBatch, _) = Run.processBatch(spark, data, whBatch, "2001-06-01 00:00:00")
    assert(nBatch == jsons.size)

    // ---- streaming warehouse: land the SAME jsons as two files, stream
    val landing = Files.createTempDirectory("graft-landing").toString
    val whStream = Files.createTempDirectory("graft-wh-stream").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val (a, b) = jsons.splitAt(jsons.size / 2)
    Files.write(Paths.get(landing, "part1.json"), a.mkString("\n").getBytes("UTF-8"))
    Files.write(Paths.get(landing, "part2.json"), b.mkString("\n").getBytes("UTF-8"))
    val q = OrderStream.startEtlStream(spark, landing, data, whStream, ckpt)
    try {
      q.processAllAvailable()
      for (t <- Seq("fct_orders.parquet", "fct_order_items.parquet"))
        assert(tableRows(s"$whStream/$t") == tableRows(s"$whBatch/$t"),
          s"stream-ingested $t differs from the batch run")

      // ---- replay: re-deliver the first half as a NEW file; the keyed
      // upsert must absorb it (same rows, no duplicates)
      val before = tableRows(s"$whStream/fct_orders.parquet")
      Files.write(Paths.get(landing, "replay.json"), a.mkString("\n").getBytes("UTF-8"))
      q.processAllAvailable()
      assert(tableRows(s"$whStream/fct_orders.parquet") == before,
        "replayed delivery changed warehouse state")
      assert(tableRows(s"$whStream/fct_order_items.parquet") ==
        tableRows(s"$whBatch/fct_order_items.parquet"))
    } finally q.stop()
  }

  test("within-batch duplicate order: one trigger carrying the same order twice lands ONE row") {
    // an at-least-once producer (or overlapping re-fetch windows) can
    // put the same order into TWO landing files of one micro-batch; the
    // keyed upsert's anti-join removes matches from the EXISTING side
    // only, so without the within-batch dedup both incoming copies
    // landed and fct_orders violated its one-row-per-key contract
    val jsons = WooFixtureApi.orderJsonsSince(spark, data, "2001-06-01 00:00:00")
    assert(jsons.nonEmpty)
    val landing = Files.createTempDirectory("graft-landing-dup").toString
    val wh = Files.createTempDirectory("graft-wh-dup").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-dup").toString
    // file A: all orders; file B: the first order AGAIN — same trigger
    Files.write(Paths.get(landing, "a.json"), jsons.mkString("\n").getBytes("UTF-8"))
    Files.write(Paths.get(landing, "b.json"), jsons.head.getBytes("UTF-8"))
    val q = OrderStream.startEtlStream(spark, landing, data, wh, ckpt)
    try {
      q.processAllAvailable()
      val orders = spark.read.parquet(s"$wh/fct_orders.parquet")
      val dupKeys = orders.groupBy("order_id")
        .count().filter(org.apache.spark.sql.functions.col("count") > 1).count()
      assert(dupKeys == 0L, s"$dupKeys duplicated order_id rows after a dup-bearing trigger")
      assert(orders.count() == jsons.size.toLong)
    } finally q.stop()
  }

  test("AvailableNow bounded replay equals the windowed backfill walk (§2.8)") {
    val iso = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val since = "2000-01-01 00:00:00"
    val jsons = WooFixtureApi.orderJsonsSince(spark, data, since)
    assert(jsons.size > 100, s"fixture should hold a real slice, got ${jsons.size}")

    // ---- batch reference: the windowed backfill walk over 90-day slices
    val whBatch = Files.createTempDirectory("graft-wh-bf").toString
    var windows = 0
    graft.etl.Incremental.backfill(
      java.time.Instant.parse("2000-01-01T00:00:00Z"),
      java.time.Instant.parse("2001-09-01T00:00:00Z"),
      java.time.Duration.ofDays(90)) { (ws, we) =>
      windows += 1
      Run.processBatch(spark, data, whBatch,
        iso.format(ws), untilIso = Some(iso.format(we)))._2
    }
    assert(windows > 2, s"walk should take several windows, took $windows")

    // ---- streaming: same orders as 4 landing files, one file per
    // micro-batch, AvailableNow → runs to catch-up then terminates
    val landing = Files.createTempDirectory("graft-landing-an").toString
    val whStream = Files.createTempDirectory("graft-wh-an").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-an").toString
    jsons.grouped((jsons.size + 3) / 4).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(Paths.get(landing, s"part$i.json"),
        chunk.mkString("\n").getBytes("UTF-8"))
    }
    val q = OrderStream.startEtlStream(spark, landing, data, whStream, ckpt,
      maxFilesPerTrigger = Some(1), availableNow = true)
    try {
      assert(q.awaitTermination(120000),
        "AvailableNow stream did not self-terminate after catch-up")
    } finally if (q.isActive) q.stop()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 4, s"expected ≥4 rate-limited micro-batches, saw $batches")
    for (t <- Seq("fct_orders.parquet", "fct_order_items.parquet"))
      assert(tableRows(s"$whStream/$t") == tableRows(s"$whBatch/$t"),
        s"AvailableNow-replayed $t differs from the backfill walk")
  }

  test("stream sink on the log backend: per-micro-batch commits, state equals the parquet stream") {
    val jsons = WooFixtureApi.orderJsonsSince(spark, data, "2001-06-01 00:00:00")
    val whP = Files.createTempDirectory("graft-wh-sp").toString
    Run.processBatch(spark, data, whP, "2001-06-01 00:00:00")

    val landing = Files.createTempDirectory("graft-landing-log").toString
    val whL = Files.createTempDirectory("graft-wh-slog").toString
    val ckpt = Files.createTempDirectory("graft-ckpt-log").toString
    jsons.grouped((jsons.size + 2) / 3).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(Paths.get(landing, s"part$i.json"),
        chunk.mkString("\n").getBytes("UTF-8"))
    }
    val q = OrderStream.startEtlStream(spark, landing, data, whL, ckpt,
      maxFilesPerTrigger = Some(1), availableNow = true,
      store = graft.etl.LogWarehouse)
    try assert(q.awaitTermination(120000)) finally if (q.isActive) q.stop()

    def logRows(table: String): Seq[String] = {
      val df = graft.io.LogTable.read(spark, s"$whL/${table}_log")
      df.select(df.columns.sorted.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
        .collect().map(_.toString).toSeq.sorted
    }
    assert(logRows("fct_orders") == tableRows(s"$whP/fct_orders.parquet"),
      "log-backend stream diverged from the batch parquet warehouse")
    assert(logRows("fct_order_items") == tableRows(s"$whP/fct_order_items.parquet"))
    // each micro-batch committed (possibly twice: orders upserts touch
    // overlapping files) — history survives for time travel
    assert(graft.io.LogTable.version(s"$whL/fct_orders_log") >= 3,
      "three micro-batches should leave at least three commits")
  }
}
