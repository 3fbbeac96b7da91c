package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite {
  import EventStream.Event

  private val spark = SparkTestSession.spark
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val batch1 = Seq(
    Event(1L, ts("2024-01-01 00:05:00"), 1L, "click", 1.0),
    Event(2L, ts("2024-01-01 00:20:00"), 1L, "click", 2.0),
    Event(3L, ts("2024-01-01 01:10:00"), 2L, "view", 3.0))
  private val batch2 = Seq(
    Event(4L, ts("2024-01-01 01:40:00"), 2L, "view", 4.0),
    Event(2L, ts("2024-01-01 00:20:00"), 1L, "click", 2.0)) // duplicate id

  test("streaming tumbling agg equals the batch transform on same input") {
    val mem = MemoryStream[Event]
    val q = EventStream.tumblingHourly(mem.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(batch1: _*)
      mem.addData(batch2.head) // no dup here; dedup tested separately
      q.processAllAvailable()
      val streamed = spark.table("tumbling")
        .orderBy("wstart", "event_type")
        .collect().map(_.toSeq).toSeq
      val batch = EventStream.tumblingHourly((batch1 :+ batch2.head).toDF())
        .orderBy("wstart", "event_type")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("session windows merge events within the gap and split beyond it") {
    val events = Seq(
      Event(1L, ts("2024-01-01 00:00:00"), 1L, "a", 1.0),
      Event(2L, ts("2024-01-01 00:04:00"), 1L, "a", 1.0), // 4 min gap: same session
      Event(3L, ts("2024-01-01 00:09:30"), 1L, "a", 1.0), // 5.5 min gap: new session
      Event(4L, ts("2024-01-01 00:14:30"), 1L, "a", 1.0)  // exactly 5 min: merges (gap is inclusive)
    ).toDF()
    val got = EventStream.userSessions(events)
      .orderBy("session_start")
      .select("session_start", "n_events")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq
    assert(got == Seq(
      ("2024-01-01 00:00:00.0", 2L),
      ("2024-01-01 00:09:30.0", 2L)))
  }

  test("dropDuplicatesWithinWatermark removes re-delivered event ids") {
    val mem = MemoryStream[Event]
    val q = EventStream.dedupedStream(mem.toDF())
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*) // re-delivers event_id=2
      q.processAllAvailable()
      val ids = spark.table("deduped").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("stream-stream interval join correlates within horizon, same user only") {
    val lmem = MemoryStream[Event]
    val rmem = MemoryStream[Event]
    val q = EventStream.correlateWithin(lmem.toDF(), rmem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("corr")
      .outputMode(OutputMode.Append()).start()
    val clicks = Seq(Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0))
    val errors = Seq(
      Event(100L, ts("2024-01-01 00:05:00"), 1L, "error", 0.0), // within horizon
      Event(101L, ts("2024-01-01 00:20:00"), 1L, "error", 0.0), // beyond horizon
      Event(102L, ts("2024-01-01 00:05:00"), 2L, "error", 0.0)) // other user
    try {
      lmem.addData(clicks: _*)
      rmem.addData(errors: _*)
      q.processAllAvailable()
      val got = spark.table("corr").select("l_id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 100L)))
    } finally q.stop()
    // the same transform in batch mode gives the identical pairs
    val batchGot = EventStream.correlateWithin(clicks.toDF(), errors.toDF())
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batchGot == Seq((1L, 100L)))
  }

  test("left-outer interval join emits unmatched clicks with NULLs after watermark eviction") {
    val lmem = MemoryStream[Event]
    val rmem = MemoryStream[Event]
    val q = EventStream.correlateWithin(lmem.toDF(), rmem.toDF(),
        "10 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("corrleft")
      .outputMode(OutputMode.Append()).start()
    try {
      // u1 matches; u2 never will — it must NOT emit yet (no watermark
      // has proven its horizon empty)
      lmem.addData(
        Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
        Event(2L, ts("2024-01-01 00:00:00"), 2L, "click", 1.0))
      rmem.addData(Event(100L, ts("2024-01-01 00:05:00"), 1L, "error", 0.0))
      q.processAllAvailable()
      val early = spark.table("corrleft").select("l_id").collect().map(_.getLong(0))
      assert(early.toSet == Set(1L),
        s"unmatched click leaked before watermark eviction: ${early.mkString(",")}")
      // advance BOTH watermarks far past u2's horizon (global watermark
      // is the min across inputs) — the eviction lands at the END of
      // this batch, so the NULL row emits in a SUBSEQUENT one
      lmem.addData(Event(3L, ts("2024-01-01 02:00:00"), 3L, "click", 1.0))
      rmem.addData(Event(101L, ts("2024-01-01 02:01:00"), 3L, "error", 0.0))
      q.processAllAvailable()
      lmem.addData(Event(4L, ts("2024-01-01 03:00:00"), 4L, "click", 1.0))
      rmem.addData(Event(102L, ts("2024-01-01 03:00:30"), 4L, "error", 0.0))
      q.processAllAvailable()
      val rows = spark.table("corrleft")
        .select("l_id", "r_id")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(rows.contains((2L, -1L)),
        s"unmatched click never emitted its NULL-right row: $rows")
      assert(rows.contains((1L, 100L)) && rows.contains((3L, 101L)))
    } finally q.stop()
  }

  test("full-outer interval join evicts BOTH sides: unmatched error emits NULL-left after its own event time passes") {
    val lmem = MemoryStream[Event]
    val rmem = MemoryStream[Event]
    val q = EventStream.correlateWithin(lmem.toDF(), rmem.toDF(),
        "10 minutes", joinType = "full_outer")
      .writeStream.format("memory").queryName("corrfull")
      .outputMode(OutputMode.Append()).start()
    try {
      // u1 matches both ways; u2's click and u5's error never match —
      // NEITHER may emit yet (no watermark has proven their windows empty)
      lmem.addData(
        Event(1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
        Event(2L, ts("2024-01-01 00:00:00"), 2L, "click", 1.0))
      rmem.addData(
        Event(100L, ts("2024-01-01 00:05:00"), 1L, "error", 0.0),
        Event(200L, ts("2024-01-01 00:06:00"), 5L, "error", 0.0))
      q.processAllAvailable()
      val early = spark.table("corrfull")
        .select("l_id", "r_id").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(early == Set((1L, 100L)),
        s"unmatched rows leaked before watermark eviction: $early")
      // advance both watermarks past every horizon; evictions land at
      // batch END, so the NULL rows emit in subsequent batches
      lmem.addData(Event(3L, ts("2024-01-01 02:00:00"), 3L, "click", 1.0))
      rmem.addData(Event(101L, ts("2024-01-01 02:01:00"), 3L, "error", 0.0))
      q.processAllAvailable()
      lmem.addData(Event(4L, ts("2024-01-01 03:00:00"), 4L, "click", 1.0))
      rmem.addData(Event(102L, ts("2024-01-01 03:00:30"), 4L, "error", 0.0))
      q.processAllAvailable()
      val rows = spark.table("corrfull")
        .select("user_id", "l_id", "r_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(rows.contains((2L, 2L, -1L)),
        s"unmatched click never emitted its NULL-right row: $rows")
      assert(rows.contains((5L, -1L, 200L)),
        "unmatched error never emitted its NULL-left row — right-side " +
          s"eviction broken (user_id must come from the right side): $rows")
      assert(rows.contains((1L, 1L, 100L)))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user totals across batches") {
    val mem = MemoryStream[Event]
    val q = EventStream.runningUserTotals(spark, mem.toDF())
      .writeStream.format("memory").queryName("running")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2.head)
      q.processAllAvailable()
      // last update per user wins
      val last = spark.table("running")
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n"),
          org.apache.spark.sql.functions.max("total_value").as("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
      assert(last == Seq((1L, 2L, 3.0), (2L, 2L, 7.0)))
    } finally q.stop()
  }

  test("threshold alerts never re-fire after a dip below an alerted boundary") {
    val mem = MemoryStream[Event]
    val q = EventStream.thresholdAlerts(spark, mem.toDF(), step = 5.0)
      .writeStream.format("memory").queryName("alerts_dip")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Event(1L, ts("2024-01-01 00:00:00"), 1L, "buy", 7.0))
      q.processAllAvailable() // total 7 -> alert at 5
      mem.addData(Event(2L, ts("2024-01-01 00:01:00"), 1L, "refund", -4.0))
      q.processAllAvailable() // total 3 -> nothing
      mem.addData(Event(3L, ts("2024-01-01 00:02:00"), 1L, "buy", 4.0))
      q.processAllAvailable() // total 7 again -> 5 already fired, nothing
      mem.addData(Event(4L, ts("2024-01-01 00:03:00"), 1L, "buy", 4.0))
      q.processAllAvailable() // total 11 -> alert at 10
      val fired = spark.table("alerts_dip").select("threshold")
        .collect().map(_.getDouble(0)).sorted.toSeq
      assert(fired == Seq(5.0, 10.0))
    } finally q.stop()
  }

  test("watermark drops late data: a closed window is never re-emitted") {
    val mem = MemoryStream[Event]
    val q = EventStream.tumblingHourly(
      EventStream.withEventWatermark(mem.toDF(), "10 minutes"))
      .writeStream.format("memory").queryName("late_drop")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch A: window [00:00,01:00) gets one event; the 02:00 event
      // advances the watermark to 01:50 > 01:00, closing the window
      mem.addData(
        Event(1L, ts("2024-01-01 00:05:00"), 1L, "a", 1.0),
        Event(2L, ts("2024-01-01 02:00:00"), 1L, "a", 1.0))
      q.processAllAvailable()
      // batch B: 00:30 is far behind the 01:50 watermark → dropped
      mem.addData(Event(3L, ts("2024-01-01 00:30:00"), 1L, "a", 99.0))
      q.processAllAvailable()
      val w0 = spark.table("late_drop")
        .filter(org.apache.spark.sql.functions.col("wstart") === ts("2024-01-01 00:00:00"))
        .collect()
      assert(w0.length == 1, "closed window must be emitted exactly once")
      assert(w0.head.getAs[Long]("n") == 1L, "late event must not be counted")
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits one alert per crossed threshold (0..n per batch)") {
    val mem = MemoryStream[Event]
    val q = EventStream.thresholdAlerts(spark, mem.toDF(), step = 2.0)
      .writeStream.format("memory").queryName("alerts")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: 1.0 → no alert yet
      mem.addData(Event(1L, ts("2024-01-01 00:00:00"), 1L, "a", 1.0))
      q.processAllAvailable()
      // user 1: +5.0 = 6.0 → crosses 2.0, 4.0, 6.0 → three alerts in one batch
      mem.addData(Event(2L, ts("2024-01-01 00:01:00"), 1L, "a", 5.0))
      q.processAllAvailable()
      val alerts = spark.table("alerts")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      assert(alerts == Seq((1L, 2.0), (1L, 4.0), (1L, 6.0)))
    } finally q.stop()
  }

  test("foreachBatch upsert sink: re-delivered keys replace, new keys append") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val path = s"$dir/events_table.parquet"
    val mem = MemoryStream[Event]
    val q = EventStream.startUpsertSink(
      spark, mem.toDF(), path, Seq("event_id"), s"$dir/ckpt")
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      // batch2 re-delivers event_id=2 (same values) and adds event_id=4
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val table = spark.read.parquet(path)
      assert(table.count() == 4)
      assert(table.select("event_id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("Trigger.AvailableNow replays the bounded source and terminates (backfill analogue)") {
    val stream = EventStream.readStream(spark, "/root/testdata/sf0.001")
    val q = EventStream.tumblingHourly(stream)
      .writeStream.format("memory").queryName("avail_now")
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
      // the bounded replay must equal the batch computation on the same data
      val batchN = EventStream.tumblingHourly(
        graft.io.Tables.events(spark, "/root/testdata/sf0.001")).count()
      assert(spark.table("avail_now").count() == batchN)
    } finally q.stop()
  }

  test("file-source stream over the fixture events dir runs end-to-end") {
    val stream = EventStream.readStream(spark, "/root/testdata/sf0.001")
    assert(stream.isStreaming)
    val q = EventStream.tumblingHourly(EventStream.withEventWatermark(stream))
      .writeStream.format("memory").queryName("fixture_tumbling")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; all but the last
      // hour of the fixture should be final
      assert(spark.table("fixture_tumbling").count() > 0)
    } finally q.stop()
  }
}
