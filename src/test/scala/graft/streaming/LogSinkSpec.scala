package graft.streaming

import graft.SparkTestSession
import graft.io.LogTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The native graft-log STREAMING SINK, end to end as a log→log
  * pipeline: `readStream.format("graft-log")` tails the source's commit
  * log, `writeStream.format("graft-log")` lands each micro-batch as one
  * transactional append commit fenced by (queryId, epochId) in the
  * manifest txns map. Together they make the pipeline exactly-once with
  * no foreachBatch user code: the source replays version ranges
  * deterministically, the sink refuses epochs at or below its committed
  * watermark. LogTableSpec covers the fence mechanics (replay, zombie
  * race, checkpoint fold survival); this spec pins the wiring Spark
  * actually drives — factory, per-epoch staging, commit-message
  * scoping, restart-with-delta, idle no-op, transform schema. */
class LogSinkSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("log-to-log streaming pipeline: delta-only restarts, idle no-ops, derived columns") {
    val base = Files.createTempDirectory("graft-logsink").toString
    val src = s"$base/src"
    val dst = s"$base/dst"
    val ckpt = s"$base/ckpt"
    LogTable.create(spark, src,
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), "k")
    LogTable.append(spark, src,
      (101L to 200L).map(i => (i, s"v$i")).toDF("k", "v"), "k")

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-log").load(src)
        .withColumn("klen", length(col("v")).cast("long"))
        .writeStream.format("graft-log")
        .option("checkpointLocation", ckpt)
        .option("keyCol", "k")
        .trigger(Trigger.AvailableNow())
        .start(dst)
      assert(q.awaitTermination(180000), "stream did not finish in time")
    }

    runOnce()
    val out1 = LogTable.read(spark, dst)
    assert(out1.count() == 200L)
    assert(out1.schema.fieldNames.toSeq == Seq("k", "v", "klen"))
    assert(out1.filter(col("klen") =!= length(col("v"))).count() == 0L)
    // the sink recorded its txn watermark under the streaming query id
    val versionAfter1 = LogTable.version(dst)

    // restart with MORE source commits: exactly the delta lands
    LogTable.append(spark, src,
      (201L to 250L).map(i => (i, s"v$i")).toDF("k", "v"), "k")
    runOnce()
    val out2 = LogTable.read(spark, dst)
    assert(out2.count() == 250L)
    assert(out2.select("k").distinct().count() == 250L,
      "restart must append only the unread source versions — no replays")

    // idle restart (no new source data): no commit at all
    val versionAfter2 = LogTable.version(dst)
    assert(versionAfter2 > versionAfter1)
    runOnce()
    assert(LogTable.version(dst) == versionAfter2,
      "an idle trigger must not grow the destination log")
    assert(LogTable.read(spark, dst).count() == 250L)

    // the destination is a first-class log table: keyed upserts and
    // pruned reads work on it directly afterwards
    LogTable.upsert(spark, dst,
      Seq((1L, "upd", 3L)).toDF("k", "v", "klen"), "k")
    assert(LogTable.read(spark, dst)
      .filter(col("k") === 1L).head().getString(1) == "upd")
  }

  test("streaming sink through the SQL catalog: writeStream.toTable on a LogCatalog table") {
    val base = Files.createTempDirectory("graft-logsink3").toString
    val src = s"$base/src"
    LogTable.create(spark, src,
      (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v"), "k")
    spark.conf.set("spark.sql.catalog.graftsink",
      classOf[graft.sources.v2.LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftsink.warehouse", s"$base/wh")
    spark.sql("CREATE NAMESPACE graftsink.etl")
    spark.sql("CREATE TABLE graftsink.etl.sunk (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('keyCol'='k')")
    val q = spark.readStream.format("graft-log").load(src)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .toTable("graftsink.etl.sunk")
    assert(q.awaitTermination(180000))
    assert(spark.sql("SELECT count(*) FROM graftsink.etl.sunk")
      .head().getLong(0) == 50L)
    // the epoch watermark rode the catalog path too: idle restart no-ops
    val v = LogTable.version(s"$base/wh/etl/sunk")
    val q2 = spark.readStream.format("graft-log").load(src)
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .toTable("graftsink.etl.sunk")
    assert(q2.awaitTermination(180000))
    assert(LogTable.version(s"$base/wh/etl/sunk") == v)
  }

  test("Complete output mode: each epoch's aggregate state REPLACES the table, never accumulates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("graft-logsink4").toString
    val dst = s"$base/dst"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val counts = input.toDF().withColumnRenamed("value", "k")
      .groupBy(col("k") % 3 as "bucket").agg(count("*").as("n"))
      .select(col("bucket").cast("long").as("bucket"), col("n"))
    val q = counts.writeStream
      .outputMode("complete")
      .format("graft-log")
      .option("checkpointLocation", s"$base/ckpt")
      .option("keyCol", "bucket")
      .start(dst)
    try {
      input.addData(0L to 8L: _*) // buckets 0,1,2 -> 3 each
      q.processAllAvailable()
      val s1 = LogTable.read(spark, dst).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(s1 == Map(0L -> 3L, 1L -> 3L, 2L -> 3L), s1.toString)
      input.addData(0L, 0L, 3L) // bucket 0 gains 3 more
      q.processAllAvailable()
      val s2 = LogTable.read(spark, dst).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the COMPLETE state, not an accumulation of epochs
      assert(s2 == Map(0L -> 6L, 1L -> 3L, 2L -> 3L),
        s"complete mode must replace, got $s2")
      assert(LogTable.read(spark, dst).count() == 3L,
        "row count must equal the state size, not state x epochs")
    } finally q.stop()
    // the pre-replacement epoch is still one version back (ordinary
    // log history, time travel intact)
    val prev = LogTable.readVersion(spark, dst, LogTable.version(dst) - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prev == Map(0L -> 3L, 1L -> 3L, 2L -> 3L))
  }

  test("Update output mode with option(upsert): each epoch's changed keys replace, unchanged keys survive") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("graft-logsink5").toString
    val dst = s"$base/dst"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val counts = input.toDF().withColumnRenamed("value", "k")
      .groupBy(col("k") % 5 as "bucket").agg(count("*").as("n"))
      .select(col("bucket").cast("long").as("bucket"), col("n"))
    val q = counts.writeStream
      .outputMode("update")
      .format("graft-log")
      .option("checkpointLocation", s"$base/ckpt")
      .option("keyCol", "bucket")
      .option("upsert", "true")
      .start(dst)
    try {
      input.addData(0L, 1L, 2L, 3L, 4L)
      q.processAllAvailable()
      val s1 = LogTable.read(spark, dst).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(s1 == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
      // only buckets 0 and 1 change: Update mode emits just those, and
      // the upsert epoch replaces them while 2/3/4 survive untouched
      input.addData(0L, 0L, 1L)
      q.processAllAvailable()
      val s2 = LogTable.read(spark, dst).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(s2 == Map(0L -> 3L, 1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
        s"upsert epochs must replace changed keys only, got $s2")
      assert(LogTable.read(spark, dst).count() == 5L,
        "no duplicate keys after an update epoch")
    } finally q.stop()
    // Update mode WITHOUT the upsert option is rejected at query start:
    // silently appending one row per (key, epoch) into a keyed table is
    // the footgun the conditional marker refuses
    val noOpt = intercept[Exception] {
      val qBad = counts.writeStream
        .outputMode("update")
        .format("graft-log")
        .option("checkpointLocation", s"$base/ckpt3")
        .option("keyCol", "bucket")
        .start(s"$base/dst3")
      try qBad.processAllAvailable() finally qBad.stop()
    }
    assert(Iterator.iterate(noOpt: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(m =>
        m.toLowerCase.contains("update"))), noOpt.toString)
    // upsert + Complete conflict loudly
    val e = intercept[Exception] {
      val q2 = counts.writeStream
        .outputMode("complete")
        .format("graft-log")
        .option("checkpointLocation", s"$base/ckpt2")
        .option("keyCol", "bucket")
        .option("upsert", "true")
        .start(s"$base/dst2")
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(_.contains("conflict"))), e.toString)
  }

  test("merge-on-read streaming upsert: epochs commit DV deltas, zero rewrites, feed exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("graft-logsink-mor").toString
    val dst = s"$base/dst"
    // seeded table under the per-table merge-on-read policy (the same
    // `rowLevel` property the SQL row-level path honors)
    LogTable.create(spark, dst,
      Seq((0L, 10L), (1L, 11L), (2L, 12L), (3L, 13L), (4L, 14L))
        .toDF("bucket", "n"), "bucket")
    LogTable.setProperties(dst, Map("rowLevel" -> "merge-on-read"))
    val filesBefore = LogTable.read(spark, dst).inputFiles.toSet
    val vBefore = LogTable.version(dst)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("bucket", "n").writeStream
      .outputMode("update")
      .format("graft-log")
      .option("checkpointLocation", s"$base/ckpt")
      .option("keyCol", "bucket")
      .option("upsert", "true")
      .start(dst)
    try {
      // one matched update + one insert: the epoch must land as ONE DV
      // commit — the matched key dies via a vector, the epoch's part
      // registers as an append, NO seed file rewrites
      input.addData((0L, 100L), (5L, 105L))
      q.processAllAvailable()
      val s1 = LogTable.read(spark, dst).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(s1 == Map(0L -> 100L, 1L -> 11L, 2L -> 12L, 3L -> 13L,
        4L -> 14L, 5L -> 105L), s1.toString)
      val filesAfter = LogTable.read(spark, dst).inputFiles.toSet
      assert(filesBefore.subsetOf(filesAfter),
        "a merge-on-read streaming epoch rewrote seed files")
      assert(LogTable.version(dst) == vBefore + 1, "expected ONE epoch commit")
      assert(LogTable.liveDvs(dst, None).valuesIterator.flatten.toSet == Set(0L),
        "the matched key must die via a deletion vector")
      // the change feed serves the streamed DV commit exactly: one
      // delete image (the pre-epoch row) + the epoch's insert images
      val feed = spark.read.format("graft-log")
        .option("readChangeFeed", "true")
        .option("startingVersion", vBefore.toString)
        .load(dst)
        .select("_change_type", "bucket", "n").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(feed == Set(("delete", 0L, 10L), ("insert", 0L, 100L),
        ("insert", 5L, 105L)), feed.toString)
      // replayed keys in a LATER epoch accumulate vectors, still zero
      // rewrites, and the dedup-on-replay semantics hold
      input.addData((0L, 200L), (1L, 201L))
      q.processAllAvailable()
      val s2 = LogTable.read(spark, dst).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(s2(0L) == 200L && s2(1L) == 201L && s2.size == 6, s2.toString)
      assert(filesBefore.subsetOf(LogTable.read(spark, dst).inputFiles.toSet))
      // a BULK epoch (over the DV key budget) falls back to the
      // copy-on-write rewrite — the stream stays alive, results exact
      sys.props("graft.dv.maxKeys") = "1"
      try {
        input.addData((1L, 301L), (2L, 302L), (3L, 303L))
        q.processAllAvailable()
      } finally sys.props.remove("graft.dv.maxKeys")
      val s3 = LogTable.read(spark, dst).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(s3 == Map(0L -> 200L, 1L -> 301L, 2L -> 302L, 3L -> 303L,
        4L -> 14L, 5L -> 105L), s3.toString)
    } finally q.stop()
  }

  test("sink lifecycle soak: many epochs, then compact + truncate_history, fence and reads intact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("graft-logsink6").toString
    val dst = s"$base/dst"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Long]
    val q = input.toDF().withColumnRenamed("value", "k")
      .withColumn("v", concat(lit("r"), col("k")))
      .writeStream.format("graft-log")
      .option("checkpointLocation", s"$base/ckpt")
      .option("keyCol", "k")
      .start(dst)
    try {
      // 20 micro-batches of 50 rows: 20 commits, 20 small files
      for (i <- 0 until 20) {
        input.addData((i * 50L) until (i * 50L + 50L): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(LogTable.read(spark, dst).count() == 1000L)
    assert(LogTable.version(dst) >= 20L)
    val preMaintV = LogTable.version(dst)
    // maintenance: bin-pack the fragments, then drop the history below
    // a checkpoint — the fragmented-sink lifecycle every deployment runs
    LogTable.compact(spark, dst, "k", 100000L)
    LogTable.truncateHistory(dst, 0)
    assert(LogTable.read(spark, dst).count() == 1000L)
    assert(LogTable.read(spark, dst).inputFiles.length == 1,
      "compaction must bin-pack the sink's fragments")
    // the fence survives maintenance: resuming the SAME checkpoint with
    // no new data commits nothing (txn watermark rode the checkpoint
    // manifest through truncation)
    val q2 = input.toDF().withColumnRenamed("value", "k")
      .withColumn("v", concat(lit("r"), col("k")))
      .writeStream.format("graft-log")
      .option("checkpointLocation", s"$base/ckpt")
      .option("keyCol", "k")
      .start(dst)
    try q2.processAllAvailable() finally q2.stop()
    assert(LogTable.read(spark, dst).count() == 1000L)
    // and NEW data still lands
    val q3 = input.toDF().withColumnRenamed("value", "k")
      .withColumn("v", concat(lit("r"), col("k")))
      .writeStream.format("graft-log")
      .option("checkpointLocation", s"$base/ckpt")
      .option("keyCol", "k")
      .start(dst)
    try {
      input.addData(5000L, 5001L)
      q3.processAllAvailable()
    } finally q3.stop()
    assert(LogTable.read(spark, dst).count() == 1002L)
    assert(LogTable.version(dst) > 0L && preMaintV > 0L)
  }

  test("two concurrent streaming queries into one table: both land, neither sweeps the other's staging") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Files.createTempDirectory("graft-logsink7").toString
    val dst = s"$base/dst"
    LogTable.create(spark, dst, Seq((0L, "seed")).toDF("k", "v"), "k")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val inA = MemoryStream[Long]
    val inB = MemoryStream[Long]
    def sinkOf(in: MemoryStream[Long], ckpt: String) =
      in.toDF().withColumnRenamed("value", "k")
        .withColumn("v", concat(lit("q"), col("k")))
        .writeStream.format("graft-log")
        .option("checkpointLocation", ckpt)
        .option("keyCol", "k")
        .start(dst)
    val qA = sinkOf(inA, s"$base/ckptA")
    val qB = sinkOf(inB, s"$base/ckptB")
    try {
      // both queries run epoch 0/1/... against the SAME table — the
      // per-(query, epoch) staging dirs keep their parts apart, and the
      // append commits serialize through the optimistic log
      for (i <- 0 until 5) {
        inA.addData((1000L + i * 10L) until (1000L + i * 10L + 10L): _*)
        inB.addData((2000L + i * 10L) until (2000L + i * 10L + 10L): _*)
        qA.processAllAvailable()
        qB.processAllAvailable()
      }
    } finally { qA.stop(); qB.stop() }
    val out = LogTable.read(spark, dst)
    assert(out.count() == 101L, s"expected 1 seed + 50 + 50, got ${out.count()}")
    assert(out.select("k").distinct().count() == 101L, "no duplicates, no losses")
    assert(out.filter(col("k") >= 1000L && col("k") < 2000L).count() == 50L)
    assert(out.filter(col("k") >= 2000L).count() == 50L)
  }

  test("streaming sink bootstraps a missing table and requires a key column") {
    val base = Files.createTempDirectory("graft-logsink2").toString
    val src = s"$base/src"
    LogTable.create(spark, src, Seq((1L, "a")).toDF("k", "v"), "k")
    // no keyCol and no existing table: loud failure at stream start
    val e = intercept[Exception] {
      val q = spark.readStream.format("graft-log").load(src)
        .writeStream.format("graft-log")
        .option("checkpointLocation", s"$base/ckpt-bad")
        .trigger(Trigger.AvailableNow())
        .start(s"$base/dst-bad")
      q.awaitTermination(60000)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("keyCol"), msgs)
    // with keyCol: the table bootstraps on stream start
    val dst = s"$base/dst"
    val q = spark.readStream.format("graft-log").load(src)
      .writeStream.format("graft-log")
      .option("checkpointLocation", s"$base/ckpt")
      .option("keyCol", "k")
      .trigger(Trigger.AvailableNow())
      .start(dst)
    assert(q.awaitTermination(180000))
    assert(LogTable.read(spark, dst).count() == 1L)
    assert(LogTable.tableKeyCol(dst).contains("k"))
  }

  test("append sink serves a RENAMED destination: epoch parts land physical names") {
    val base = Files.createTempDirectory("graft-logsinkren").toString
    val src = s"$base/src"
    val dst = s"$base/dst"
    LogTable.create(spark, src,
      (1L to 50L).map(i => (i, s"s$i")).toDF("k", "label"), "k")
    LogTable.create(spark, dst,
      (1001L to 1010L).map(i => (i, s"d$i")).toDF("k", "v"), "k")
    LogTable.renameColumn(spark, dst, "v", "label")
    // the stream carries the CURRENT logical name; its epoch parts must
    // register under the physical name ('v') or the read back would
    // serve typed NULLs for every streamed row
    val q = spark.readStream.format("graft-log").load(src)
      .writeStream.format("graft-log")
      .option("checkpointLocation", s"$base/ckpt")
      .option("keyCol", "k")
      .trigger(Trigger.AvailableNow())
      .start(dst)
    assert(q.awaitTermination(180000), "stream did not finish in time")
    val out = LogTable.read(spark, dst)
    assert(out.count() == 60L)
    assert(out.schema.fieldNames.toSeq == Seq("k", "label"))
    assert(out.filter(col("label").isNull).count() == 0L,
      "streamed rows lost their values — parts registered under logical names")
    assert(out.filter(col("k") === 7L).head().getString(1) == "s7")
    assert(out.filter(col("k") === 1007L).head().getString(1) == "d1007")
  }
}
