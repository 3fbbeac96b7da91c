package graft.sources.v2

import graft.SparkTestSession
import graft.io.LogTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The graft-log DSv2 connector's contracts: snapshot equality with the
  * Scala API, manifest-stats file skipping driven by PUSHED filters
  * (integral, timestamp, string), column pruning, time travel via
  * option, and schema-evolution NULL semantics — all through
  * `spark.read.format("graft-log")`, no Scala API at the call site. */
class LogConnectorSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-logconn").resolve("t").toString

  private def load(t: String) = spark.read.format("graft-log").load(t)

  test("full read through the connector equals the Scala API snapshot") {
    val t = tmpTable()
    val base = (1L to 2000L)
      .map(i => (i, s"v$i", i / 10.0, i % 2 == 0))
      .toDF("k", "v", "score", "flag")
      .withColumn("ts", col("k").cast("timestamp"))
      .repartitionByRange(4, col("k"))
    LogTable.create(spark, t, base, "k")
    LogTable.upsert(spark, t,
      Seq((5L, "up5", 0.5, true)).toDF("k", "v", "score", "flag")
        .withColumn("ts", col("k").cast("timestamp")), "k")
    val viaApi = LogTable.read(spark, t).orderBy("k").collect().toSeq
    val viaConn = load(t).orderBy("k").collect().toSeq
    assert(viaConn == viaApi, "connector snapshot diverged from LogTable.read")
    // Same names and types — but the CONNECTOR declares the key
    // non-nullable (every live file's manifest stats prove zero key
    // NULLs, and registration enforces it on every later write): the
    // non-null key is what arms the SQL merge-on-read delta path, whose
    // rowId Spark requires to be non-nullable.
    val conn = load(t).schema
    assert(conn.map(f => (f.name, f.dataType)) ==
      LogTable.read(spark, t).schema.map(f => (f.name, f.dataType)))
    assert(!conn("k").nullable, "connector must declare the proven key NOT NULL")
    assert(conn.filter(_.name != "k").forall(_.nullable))
  }

  test("pushed key filter prunes files from manifest stats; rows match the unpruned filter") {
    val t = tmpTable()
    LogTable.create(spark, t,
      (1L to 8000L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(8, col("k")), "k")
    val expected = LogTable.read(spark, t)
      .filter(col("k") >= 3400L && col("k") <= 3490L)
      .orderBy("k").collect().toSeq
    val got = load(t).filter(col("k") >= 3400L && col("k") <= 3490L)
      .orderBy("k").collect().toSeq
    assert(got == expected)
    val (kept, total) =
      (LogTableScan.lastPlannedFiles.get(), LogTableScan.lastTotalFiles.get())
    assert(total >= 8, s"expected >=8 live files, saw $total")
    assert(kept == 1, s"pushed key window planned $kept of $total files")
  }

  test("pushed timestamp filter prunes on the manifest's micros bounds") {
    val t = tmpTable()
    LogTable.create(spark, t,
      (1L to 8000L).map(i => (i, s"v$i")).toDF("k", "v")
        .withColumn("ts", col("k").cast("timestamp"))
        .repartitionByRange(8, col("ts")), "k")
    // the watermark shape: ts >= cutoff (reference run.py's orders-since)
    val cutoff = "1970-01-01 02:01:40" // epoch second 7300, inside the last bucket
    val got = load(t).filter(col("ts") >= lit(cutoff).cast("timestamp"))
      .orderBy("k").collect().map(_.getAs[Long]("k")).toSeq
    assert(got == (7300L to 8000L).toSeq)
    val (kept, total) =
      (LogTableScan.lastPlannedFiles.get(), LogTableScan.lastTotalFiles.get())
    assert(kept < total && kept <= 2,
      s"timestamp watermark planned $kept of $total files — no manifest skipping")

    // timestamp_ntz (what Spark 4 infers for the parquet fixtures): the
    // predicate arrives as LocalDateTime and must hit the same micros
    // bounds
    val t2 = tmpTable()
    LogTable.create(spark, t2,
      (1L to 8000L).map(i => (i, s"v$i")).toDF("k", "v")
        .withColumn("ts", col("k").cast("timestamp").cast("timestamp_ntz"))
        .repartitionByRange(8, col("ts")), "k")
    val got2 = load(t2).filter(col("ts") >= lit(cutoff).cast("timestamp_ntz"))
      .orderBy("k").collect().map(_.getAs[Long]("k")).toSeq
    assert(got2 == (7300L to 8000L).toSeq)
    assert(LogTableScan.lastPlannedFiles.get() < LogTableScan.lastTotalFiles.get() &&
      LogTableScan.lastPlannedFiles.get() <= 2,
      s"NTZ watermark planned ${LogTableScan.lastPlannedFiles.get()} of " +
        s"${LogTableScan.lastTotalFiles.get()} files — no manifest skipping")
  }

  test("pushed string and double filters prune; stat-less columns stay conservative") {
    val t = tmpTable()
    LogTable.create(spark, t,
      (1L to 4000L).map(i => (i, f"s$i%05d", i / 10.0)).toDF("k", "s", "d")
        .repartitionByRange(4, col("k")), "k")
    val gotS = load(t).filter(col("s") >= "s01200" && col("s") <= "s01290")
      .collect().map(_.getAs[Long]("k")).toSet
    assert(gotS == (1200L to 1290L).toSet)
    assert(LogTableScan.lastPlannedFiles.get() == 1,
      s"string window planned ${LogTableScan.lastPlannedFiles.get()} files")
    val gotD = load(t).filter(col("d") > 220.05 && col("d") < 229.05)
      .collect().map(_.getAs[Long]("k")).toSet
    assert(gotD == (2201L to 2290L).toSet)
    assert(LogTableScan.lastPlannedFiles.get() == 1,
      s"double window planned ${LogTableScan.lastPlannedFiles.get()} files")
    // IN-list pushes as a union of point windows: two points in two
    // different range-files plan exactly those two files
    val gotIn = load(t).filter(col("k").isin(5L, 3999L))
      .collect().map(_.getAs[Long]("k")).toSet
    assert(gotIn == Set(5L, 3999L))
    assert(LogTableScan.lastPlannedFiles.get() == 2,
      s"IN points planned ${LogTableScan.lastPlannedFiles.get()} of " +
        s"${LogTableScan.lastTotalFiles.get()} files")
  }

  test("pushed IN on a clustered string column prunes to the member files") {
    val t = tmpTable()
    // status-clustered layout (the reference pushes status IN (...) to
    // its source, orders.py): one COMMIT (and thus one file) per status
    // value — deterministic, unlike range-partition sampling
    val statuses = Seq("cancelled", "completed", "pending", "processing")
    def statusRows(i: Int) = ((i * 1000L + 1) to (i + 1) * 1000L)
      .map(k => (k, statuses(i))).toDF("k", "status").coalesce(1)
    LogTable.create(spark, t, statusRows(0), "k")
    for (i <- 1 until statuses.length)
      LogTable.append(spark, t, statusRows(i), "k")
    val got = load(t).filter(col("status").isin("processing", "completed"))
      .collect().map(_.getAs[Long]("k")).toSet
    assert(got == ((1001L to 2000L) ++ (3001L to 4000L)).toSet)
    val (kept, total) =
      (LogTableScan.lastPlannedFiles.get(), LogTableScan.lastTotalFiles.get())
    assert(total == 4, s"expected 4 live files, saw $total")
    assert(kept == 2, s"status IN planned $kept of $total files")
    // AND of two IN-lists intersects: point present in both lists → 1 file
    load(t).filter(col("status").isin("processing", "completed") &&
      col("status").isin("processing", "pending")).collect()
    assert(LogTableScan.lastPlannedFiles.get() == 1,
      s"intersecting IN-lists planned ${LogTableScan.lastPlannedFiles.get()} files")
    // an IN carrying a NULL member stays row-level (whole-list
    // conservatism) but still answers exactly
    val withNull = load(t)
      .filter(col("status").isin("processing", null))
      .collect().map(_.getAs[Long]("k")).toSet
    assert(withNull == (3001L to 4000L).toSet)
  }

  test("column pruning narrows the parquet projection; count(*) needs zero data columns") {
    val t = tmpTable()
    LogTable.create(spark, t,
      (1L to 1000L).map(i => (i, s"v$i", i * 2.0)).toDF("k", "v", "d"), "k")
    assert(load(t).select("v").collect().map(_.getString(0)).toSet ==
      (1L to 1000L).map(i => s"v$i").toSet)
    assert(load(t).count() == 1000L)
    // pruned single-column read through a pushed filter
    assert(load(t).filter(col("k") <= 10L).select("d")
      .collect().map(_.getDouble(0)).toSet == (1L to 10L).map(_ * 2.0).toSet)
  }

  test("asOf option time-travels; schema evolution serves typed NULLs through the connector") {
    val t = tmpTable()
    LogTable.create(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k")
    val v1 = LogTable.version(t)
    LogTable.append(spark, t, Seq((3L, "c", 30L)).toDF("k", "v", "score"), "k")
    // head: evolved schema, pre-evolution files carry NULL score
    val head = load(t).orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        Option(r.getAs[Any]("score")))).toSeq
    assert(head == Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(30L))))
    // asOf v1: the old schema, the old rows
    val old = spark.read.format("graft-log").option("asOf", v1.toString).load(t)
    assert(old.columns.toSeq == Seq("k", "v"))
    assert(old.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("streaming tail: micro-batches follow commits exactly-once, survive restart from checkpoint") {
    val t = tmpTable()
    val ckpt = Files.createTempDirectory("graft-logstream-ckpt").toString
    LogTable.create(spark, t, Seq((1L, "a")).toDF("k", "v"), "k")
    val received = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def startQuery() =
      spark.readStream.format("graft-log").load(t)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => received.add((r.getLong(0), r.getString(1))))
          ()
        }
        .start()
    import scala.jdk.CollectionConverters._
    val q = startQuery()
    try {
      q.processAllAvailable()
      assert(received.iterator().asScala.toSet == Set((1L, "a")))
      LogTable.append(spark, t, Seq((2L, "b"), (3L, "c")).toDF("k", "v"), "k")
      LogTable.append(spark, t, Seq((4L, "d")).toDF("k", "v"), "k")
      q.processAllAvailable()
      val got = received.iterator().asScala.toSeq
      assert(got.toSet == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
      assert(got.size == 4, s"duplicate delivery: $got")
    } finally q.stop()
    // restart from the checkpoint: only NEW commits flow, nothing replays
    LogTable.append(spark, t, Seq((5L, "e")).toDF("k", "v"), "k")
    received.clear()
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val got2 = received.iterator().asScala.toSeq
      assert(got2 == Seq((5L, "e")),
        s"restart re-delivered or missed rows: $got2")
    } finally q2.stop()
  }

  test("streaming rate control: maxVersionsPerTrigger caps each micro-batch at n commits") {
    val t = tmpTable()
    val ckpt = Files.createTempDirectory("graft-lograte-ckpt").toString
    LogTable.create(spark, t, Seq((1L, "a")).toDF("k", "v"), "k")
    for (i <- 2 to 5)
      LogTable.append(spark, t, Seq((i.toLong, s"v$i")).toDF("k", "v"), "k")
    // 5 commits pending; cap = 1 commit per trigger -> 5 micro-batches,
    // each carrying exactly one commit's single row
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graft-log")
      .option("maxVersionsPerTrigger", "1").load(t)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(df.count()); ()
      }
      .start()
    import scala.jdk.CollectionConverters._
    try {
      q.processAllAvailable()
      val sizes = batchSizes.iterator().asScala.toSeq
      assert(sizes.sum == 5L, s"rows across batches: $sizes")
      assert(sizes.count(_ > 0) == 5 && sizes.forall(_ <= 1L),
        s"cap of 1 commit/trigger produced batch sizes $sizes")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the pinned head in rate-controlled batches, then stops") {
    val t = tmpTable()
    val ckpt = Files.createTempDirectory("graft-lognow-ckpt").toString
    LogTable.create(spark, t, Seq((1L, "a")).toDF("k", "v"), "k")
    for (i <- 2 to 4)
      LogTable.append(spark, t, Seq((i.toLong, s"v$i")).toDF("k", "v"), "k")
    import scala.jdk.CollectionConverters._
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def drain(): Seq[Long] = {
      sizes.clear()
      val q = spark.readStream.format("graft-log")
        .option("maxVersionsPerTrigger", "1").load(t)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          sizes.add(df.count()); ()
        }
        .start()
      assert(q.awaitTermination(120000),
        "AvailableNow query did not terminate on its own after the drain")
      sizes.iterator().asScala.toSeq
    }
    // 4 commits pending, cap 1/trigger: the drain is 4 one-row batches
    // and the query self-terminates (no processAllAvailable + stop)
    val first = drain()
    assert(first.filter(_ > 0) == Seq(1L, 1L, 1L, 1L),
      s"first AvailableNow drain delivered batches $first")
    // commits that land AFTER a drain wait for the next scheduled run,
    // which resumes from the checkpoint: exactly the new commit flows
    LogTable.append(spark, t, Seq((9L, "z")).toDF("k", "v"), "k")
    val second = drain()
    assert(second.filter(_ > 0) == Seq(1L),
      s"second drain must deliver exactly the post-drain commit, got $second")
  }

  test("streaming over change commits: loud failure by default, skipChangeCommits opts out") {
    val t = tmpTable()
    LogTable.create(spark, t, Seq((1L, "a")).toDF("k", "v"), "k")
    LogTable.upsert(spark, t, Seq((1L, "a2")).toDF("k", "v"), "k")
    // default: the upsert's remove makes the range unstreamable — fail,
    // never silently drop acknowledged rows
    val q = spark.readStream.format("graft-log").load(t)
      .writeStream.format("memory").queryName("logfail").outputMode("append").start()
    try {
      intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q.processAllAvailable())
      assert(q.exception.exists(_.getMessage.contains("skipChangeCommits")))
    } finally q.stop()
    // opted in: change commits are skipped, later appends still flow
    LogTable.append(spark, t, Seq((9L, "z")).toDF("k", "v"), "k")
    val q2 = spark.readStream.format("graft-log")
      .option("skipChangeCommits", "true").load(t)
      .writeStream.format("memory").queryName("logskip").outputMode("append").start()
    try {
      q2.processAllAvailable()
      val got = spark.table("logskip").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // v1's create-append streams; v2's upsert (change commit) is
      // skipped wholesale; v3's append streams
      assert(got == Set((1L, "a"), (9L, "z")), s"skipChangeCommits delivered: $got")
    } finally q2.stop()
  }

  test("change feed (batch): retraction images reconstruct the head snapshot") {
    val t = tmpTable()
    LogTable.create(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k")   // v1
    LogTable.upsert(spark, t, Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), "k")  // v2: rewrite
    LogTable.deleteRange(spark, t, "k", 1L, 1L)                                // v3: delete
    val feed = spark.read.format("graft-log")
      .option("readChangeFeed", "true").load(t)
    assert(feed.columns.toSeq == Seq("k", "v", "_change_type", "_commit_version"))
    val rows = feed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // the feed is a RETRACTION changelog: multiset apply (inserts minus
    // deletes per row image) must equal the head snapshot exactly
    val net = rows.groupBy(r => (r._1, r._2))
      .view.mapValues(rs =>
        rs.count(_._3 == "insert") - rs.count(_._3 == "delete"))
      .toMap.filter(_._2 != 0)
    val head = LogTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(net == head, s"feed apply diverged: net=$net head=$head")
    // commit versions classify: v1 (create) carries only inserts; the
    // later rewrite/delete commits carry the delete images
    assert(rows.filter(_._4 == 1L).forall(_._3 == "insert"))
    assert(rows.exists(r => r._3 == "delete" && r._4 > 1L))
    // startingVersion is EXCLUSIVE (the streaming offset convention): a
    // feed from v1 never re-serves the create's insert images
    val fromV1 = spark.read.format("graft-log")
      .option("readChangeFeed", "true").option("startingVersion", "1")
      .load(t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(fromV1.forall(_._4 > 1L), s"startingVersion=1 served $fromV1")
    assert(fromV1.toSet == rows.filter(_._4 > 1L).toSet)
    // asOf is the feed's end bound: up to v2 the deleteRange is unseen
    val toV2 = spark.read.format("graft-log")
      .option("readChangeFeed", "true").option("asOf", "2").load(t).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSeq
    assert(toV2.forall(_._3 <= 2L))
    // conflicting intents fail loudly
    val e = intercept[Exception](spark.read.format("graft-log")
      .option("readChangeFeed", "true").option("skipChangeCommits", "true")
      .load(t).collect())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(_.contains("conflict"))), e.toString)
  }

  test("change feed (batch) crosses a RENAME: all commits serve under head logical names") {
    val t = tmpTable()
    LogTable.create(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k")
    LogTable.upsert(spark, t, Seq((2L, "b2")).toDF("k", "v"), "k")
    LogTable.renameColumn(spark, t, "v", "label")
    LogTable.upsert(spark, t, Seq((3L, "c")).toDF("k", "label"), "k")
    val feed = spark.read.format("graft-log")
      .option("readChangeFeed", "true").load(t)
    // the feed's schema is the HEAD's logical shape; pre-rename commits'
    // images serve under it (physical identity — the files never moved)
    assert(feed.columns.toSeq == Seq("k", "label", "_change_type", "_commit_version"))
    val rows = feed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(rows.exists(r => r._1 == 1L && r._2 == "a" && r._3 == "insert" && r._4 == 1L),
      s"pre-rename images must serve values under the new name: $rows")
    val net = rows.groupBy(r => (r._1, r._2))
      .view.mapValues(rs =>
        rs.count(_._3 == "insert") - rs.count(_._3 == "delete"))
      .toMap.filter(_._2 != 0)
    val head = LogTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(net == head, s"feed apply diverged across the rename: net=$net head=$head")
  }

  test("change feed serves deletion-vector commits exactly: net-new delete images, no stale or spurious retractions") {
    val t = tmpTable()
    LogTable.create(spark, t,
      (1L to 100L).map(i => (i, s"b$i")).toDF("k", "v")
        .repartitionByRange(2, col("k")), "k")                            // v1
    LogTable.upsertDV(spark, t,
      Seq((5L, "u5"), (200L, "i200")).toDF("k", "v"), "k")                // v2
    LogTable.deleteKeysDV(spark, t, "k", Seq(7L))                         // v3
    LogTable.upsertDV(spark, t, Seq((5L, "u5b")).toDF("k", "v"), "k")     // v4
    def feed(opts: (String, String)*) = {
      val r = opts.foldLeft(spark.read.format("graft-log")
        .option("readChangeFeed", "true"))((b, kv) => b.option(kv._1, kv._2))
      r.load(t).collect()
        .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3))).toSeq
    }
    val rows = feed()
    // multiset apply of the whole feed equals the head snapshot exactly
    def netOf(rs: Seq[(Long, String, String, Long)]) =
      rs.groupBy(r => (r._1, r._2)).view.mapValues(g =>
        g.count(_._3 == "insert") - g.count(_._3 == "delete"))
        .toMap.filter(_._2 != 0)
    def headCounts() = LogTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(netOf(rows) == headCounts(), "DV feed apply diverged from head")
    // v2 (merge-on-read upsert): exactly one delete image — the replaced
    // base row — plus the appended file's inserts
    val v2 = rows.filter(_._4 == 2L)
    assert(v2.filter(_._3 == "delete").map(r => (r._1, r._2)).toSet ==
      Set((5L, "b5")))
    assert(v2.filter(_._3 == "insert").map(r => (r._1, r._2)).toSet ==
      Set((5L, "u5"), (200L, "i200")))
    // v3 (pure metadata key delete): the killed image, nothing else
    assert(rows.filter(_._4 == 3L).map(r => (r._1, r._2, r._3)).toSet ==
      Set((7L, "b7", "delete")))
    // v4 re-kills key 5 — dead in the BASE file since v2, live in v2's
    // appended file: the feed must emit the CURRENT image (u5) exactly
    // once, never the stale b5
    val v4 = rows.filter(_._4 == 4L)
    assert(v4.filter(_._3 == "delete").map(r => (r._1, r._2)).toSet ==
      Set((5L, "u5")), s"v4 delete images: $v4")
    assert(v4.filter(_._3 == "insert").map(r => (r._1, r._2)).toSet ==
      Set((5L, "u5b")))
    // a REWRITE of vectored files (compact = the DV vacuum) retracts
    // only rows LIVE at removal: no spurious retraction of already-dead
    // rows, no stale images — and the feed still applies to the head
    LogTable.compact(spark, t, "k", targetRows = 1000000L)               // v5
    val afterCompact = feed("startingVersion" -> "4")
    val v5dels = afterCompact.filter(r => r._3 == "delete" && r._4 == 5L)
    assert(!v5dels.exists(_._1 == 7L),
      "compact retracted a row a vector had already retracted")
    assert(!v5dels.exists(r => r._1 == 5L && r._2 != "u5b"),
      s"compact retracted a stale image of key 5: $v5dels")
    assert(netOf(feed()) == headCounts(),
      "post-compact DV feed apply diverged from head")
  }

  test("change feed below a truncation checkpoint fails loudly, never serves a partial feed") {
    val t = tmpTable()
    LogTable.create(spark, t, Seq((1L, "a")).toDF("k", "v"), "k")
    LogTable.append(spark, t, Seq((2L, "b")).toDF("k", "v"), "k")
    LogTable.upsert(spark, t, Seq((1L, "a2")).toDF("k", "v"), "k")
    LogTable.append(spark, t, Seq((3L, "c")).toDF("k", "v"), "k")
    LogTable.truncateHistory(t, keepLast = 1) // checkpoint at v3
    val cut = LogTable.history(t).head.version
    // a window starting below the cut lost its per-commit deltas —
    // silent incompleteness would be data loss to an incremental view
    val e = intercept[Exception](spark.read.format("graft-log")
      .option("readChangeFeed", "true").load(t).collect())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(m =>
        m.contains("truncation") && m.contains(s"v$cut"))), e.toString)
    // from the cut onward the feed serves completely
    val got = spark.read.format("graft-log")
      .option("readChangeFeed", "true")
      .option("startingVersion", cut.toString).load(t)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((3L, "insert")), s"feed from the cut served $got")
  }

  test("change feed under rate control: capped micro-batches deliver per-commit images exactly-once") {
    val t = tmpTable()
    val ckpt = Files.createTempDirectory("graft-logcdfrate-ckpt").toString
    LogTable.create(spark, t, Seq((1L, "a")).toDF("k", "v"), "k")     // v1
    LogTable.upsert(spark, t, Seq((1L, "a2")).toDF("k", "v"), "k")    // v2: delete+insert
    LogTable.append(spark, t, Seq((2L, "b")).toDF("k", "v"), "k")     // v3
    LogTable.deleteRange(spark, t, "k", 2L, 2L)                       // v4: delete
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Set[(Long, String, String, Long)]]()
    val q = spark.readStream.format("graft-log")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1").load(t)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(df.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet)
        ()
      }.start()
    import scala.jdk.CollectionConverters._
    try {
      q.processAllAvailable()
      val got = batches.iterator().asScala.filter(_.nonEmpty).toSeq
      // cap 1: each non-empty micro-batch carries exactly ONE commit's
      // images (all rows share a _commit_version)
      assert(got.forall(b => b.map(_._4).size == 1),
        s"a capped batch mixed commit versions: $got")
      assert(got.map(_.head._4) == got.map(_.head._4).sorted,
        "capped batches delivered out of version order")
      // the concatenation is the full feed: multiset apply reconstructs
      // the head exactly as the uncapped stream would
      val all = got.flatten
      val net = all.groupBy(r => (r._1, r._2))
        .view.mapValues(rs =>
          rs.count(_._3 == "insert") - rs.count(_._3 == "delete"))
        .toMap.filter(_._2 != 0)
      val head = LogTable.read(spark, t).collect()
        .map(r => ((r.getLong(0), r.getString(1)), 1)).toMap
      assert(net == head, s"rate-controlled feed apply diverged: $net vs $head")
      // v2's rewrite really arrived as its own delete+insert batch
      assert(got.exists(b => b.exists(_._3 == "delete") && b.exists(_._3 == "insert")))
    } finally q.stop()
  }

  test("change feed: pushed filters prune ADD files from the feed by manifest stats") {
    val t = tmpTable()
    LogTable.create(spark, t,
      (1L to 100L).map(i => (i, s"a$i")).toDF("k", "v")
        .repartitionByRange(4, col("k")), "k")
    LogTable.append(spark, t,
      (200L to 300L).map(i => (i, s"b$i")).toDF("k", "v")
        .repartitionByRange(4, col("k")), "k")
    // a key predicate admits only the second append's files; every
    // filter stays residual so the returned rows are exact either way
    val got = spark.read.format("graft-log")
      .option("readChangeFeed", "true").load(t)
      .filter(col("k") >= 250L)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == (250L to 300L).toSet)
    assert(LogTableScan.lastPlannedFiles.get() < LogTableScan.lastTotalFiles.get(),
      s"CDF planned ${LogTableScan.lastPlannedFiles.get()} of " +
        s"${LogTableScan.lastTotalFiles.get()} files — no manifest skipping")
  }

  test("change feed (stream): change commits stream as retraction images, exactly-once across restart") {
    val t = tmpTable()
    val ckpt = Files.createTempDirectory("graft-logcdf-ckpt").toString
    LogTable.create(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k")
    LogTable.upsert(spark, t, Seq((2L, "b2")).toDF("k", "v"), "k")
    val received =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String, Long)]()
    def startQuery() =
      spark.readStream.format("graft-log")
        .option("readChangeFeed", "true").load(t)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => received.add(
            (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))))
          ()
        }
        .start()
    import scala.jdk.CollectionConverters._
    val q = startQuery()
    try {
      q.processAllAvailable()
      val got = received.iterator().asScala.toSeq
      // v2's rewrite serves the old image as delete and both new rows;
      // multiset apply reconstructs the head
      val net = got.groupBy(r => (r._1, r._2))
        .view.mapValues(rs =>
          rs.count(_._3 == "insert") - rs.count(_._3 == "delete"))
        .toMap.filter(_._2 != 0)
      val head = LogTable.read(spark, t).collect()
        .map(r => (r.getLong(0), r.getString(1)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(net == head, s"stream feed apply diverged: net=$net head=$head")
      assert(got.exists(_._3 == "delete"), s"no delete image streamed: $got")
    } finally q.stop()
    // restart from the checkpoint: only NEW commits' images flow
    LogTable.deleteRange(spark, t, "k", 1L, 1L)
    received.clear()
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val got2 = received.iterator().asScala.toSeq
      assert(got2.nonEmpty && got2.forall(r =>
        r._3 == "delete" && r._1 == 1L || r._3 == "insert" && r._1 != 1L),
        s"restart replayed or mislabeled: $got2")
      assert(got2.exists(r => r._3 == "delete" && r._2 == "a"),
        s"the deleteRange's retraction image is missing: $got2")
    } finally q2.stop()
    // DELETION-VECTOR commits stream through the same planner: a
    // merge-on-read upsert's micro-batch carries the net-new delete
    // image + the appended insert, exactly once from the checkpoint
    LogTable.upsertDV(spark, t, Seq((2L, "b3")).toDF("k", "v"), "k")
    received.clear()
    val q3 = startQuery()
    try {
      q3.processAllAvailable()
      val got3 = received.iterator().asScala.toSeq
      assert(got3.map(r => (r._1, r._2, r._3)).toSet ==
        Set((2L, "b2", "delete"), (2L, "b3", "insert")),
        s"DV commit streamed wrong images: $got3")
    } finally q3.stop()
  }

  test("DSv2 write path: df.write appends through the log commit; key column rides as a table property") {
    val t = tmpTable()
    LogTable.create(spark, t, Seq((1L, "a")).toDF("k", "v"), "k")
    assert(LogTable.tableKeyCol(t).contains("k"),
      "create must record the key-column property")
    // no keyCol option needed: the table property serves it
    Seq((2L, "b"), (3L, "c")).toDF("k", "v")
      .write.format("graft-log").mode("append").save(t)
    assert(load(t).orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(LogTable.version(t) == 2L, "DSv2 append must be one log commit")
    // schema evolution flows through the same append: a wider batch
    // evolves, the old rows serve NULLs
    Seq((4L, "d", 40L)).toDF("k", "v", "score")
      .write.format("graft-log").mode("append").save(t)
    val r = load(t).orderBy("k").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(r.map(x => Option(x.getAs[Any]("score"))).toSeq ==
      Seq(None, None, None, Some(40L)))
    // a write keyed differently than the table fails loudly (wrong-column
    // stats would silently misprune forever)
    val e = intercept[Exception] {
      Seq((5L, "e", 50L)).toDF("k", "v", "score")
        .write.format("graft-log").option("keyCol", "score").mode("append").save(t)
    }
    assert(e.getMessage != null && e.getMessage.contains("keyed by"),
      s"mismatched key column must name the contract: ${e.getMessage}")
    // writing a nonexistent table WITHOUT a key column fails at
    // analysis with guidance (nothing to record as the table's key)
    val missing = intercept[Exception] {
      Seq((1L, "x")).toDF("k", "v")
        .write.format("graft-log").mode("append").save(tmpTable())
    }
    assert(missing.getMessage.contains("does not exist"))
  }

  test("DSv2 write path bootstraps a fresh table when keyCol is given; second write appends") {
    val t = tmpTable()
    // first write on an empty path: creates the table, records keyCol
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft-log").option("keyCol", "k").mode("append").save(t)
    assert(LogTable.version(t) == 1L, "bootstrap must be the v1 create commit")
    assert(LogTable.tableKeyCol(t).contains("k"),
      "bootstrap must record the key-column property")
    // second write: plain append, no option needed (property serves it)
    Seq((3L, "c")).toDF("k", "v")
      .write.format("graft-log").mode("append").save(t)
    assert(LogTable.version(t) == 2L)
    assert(load(t).orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the bootstrapped table serves manifest-stats pruning like any other
    load(t).filter(col("k") === 1L).collect()
    assert(LogTableScan.lastPlannedFiles.get() <= LogTableScan.lastTotalFiles.get())
  }

  test("null-count stats prune IS NULL / IS NOT NULL; OR pushes as a clause") {
    val t = tmpTable()
    // file 1: no nulls anywhere; file 2: score entirely null (one
    // commit each — deterministic two-file layout)
    LogTable.create(spark, t,
      (1L to 1000L).map(i => (i, s"v$i", i * 2L)).toDF("k", "v", "score")
        .coalesce(1), "k")
    LogTable.append(spark, t,
      (1001L to 2000L).map(i => (i, s"v$i")).toDF("k", "v")
        .withColumn("score", lit(null).cast("long")).coalesce(1), "k")
    // IS NULL: only the all-null file plans
    val gotNull = load(t).filter(col("score").isNull)
      .collect().map(_.getAs[Long]("k")).toSet
    assert(gotNull == (1001L to 2000L).toSet)
    assert(LogTableScan.lastTotalFiles.get() == 2)
    assert(LogTableScan.lastPlannedFiles.get() == 1,
      s"IS NULL planned ${LogTableScan.lastPlannedFiles.get()} of 2 files")
    // IS NOT NULL: only the no-null file plans
    val gotNotNull = load(t).filter(col("score").isNotNull)
      .collect().map(_.getAs[Long]("k")).toSet
    assert(gotNotNull == (1L to 1000L).toSet)
    assert(LogTableScan.lastPlannedFiles.get() == 1,
      s"IS NOT NULL planned ${LogTableScan.lastPlannedFiles.get()} of 2 files")
    // OR clause: each side admits a different file -> both plan; a
    // range OR that misses both files -> zero plan
    val gotOr = load(t).filter(col("k") <= 10L || col("k") >= 1990L)
      .collect().map(_.getAs[Long]("k")).toSet
    assert(gotOr == ((1L to 10L) ++ (1990L to 2000L)).toSet)
    assert(LogTableScan.lastPlannedFiles.get() == 2)
    assert(load(t).filter(col("k") < 0L || col("k") > 5000L).count() == 0L)
    assert(LogTableScan.lastPlannedFiles.get() == 0,
      s"out-of-range OR planned ${LogTableScan.lastPlannedFiles.get()} files")
    // OR mixing a range and a null check prunes to the matching files
    load(t).filter(col("score").isNull || col("k") <= 10L).collect()
    assert(LogTableScan.lastPlannedFiles.get() == 2)
    load(t).filter(col("score").isNull && col("k") <= 10L).collect()
    assert(LogTableScan.lastPlannedFiles.get() == 0,
      "IS NULL AND low-range window should prune both files")
  }

  test("LogCatalog: SQL DDL + INSERT + SELECT over log tables by name, pushdown intact") {
    val wh = Files.createTempDirectory("graft-logcat").toString
    spark.conf.set("spark.sql.catalog.graftcat", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftcat.etl")
    // DDL creates an empty v1 with committed schema + keyCol property
    spark.sql("CREATE TABLE graftcat.etl.orders (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('keyCol'='k')")
    assert(LogTable.tableKeyCol(s"$wh/etl/orders").contains("k"))
    assert(spark.sql("SELECT * FROM graftcat.etl.orders").count() == 0)
    // INSERT with matching names: by-name through the one append path
    spark.sql("INSERT INTO graftcat.etl.orders SELECT id AS k, " +
      "concat('v', id) AS v FROM range(1, 1001)")
    // positional INSERT: expression names don't match -> positional+cast
    spark.sql("INSERT INTO graftcat.etl.orders SELECT 2000 + id, 'p' " +
      "FROM range(0, 5)")
    assert(spark.sql("SELECT count(*) FROM graftcat.etl.orders").head().getLong(0) == 1005L)
    assert(spark.sql(
      "SELECT v FROM graftcat.etl.orders WHERE k = 2000").head().getString(0) == "p")
    // pushdown serves SQL reads: point predicate prunes to 1 file of >=2
    spark.sql("SELECT * FROM graftcat.etl.orders WHERE k = 42").collect()
    assert(LogTableScan.lastTotalFiles.get() >= 2)
    assert(LogTableScan.lastPlannedFiles.get() < LogTableScan.lastTotalFiles.get(),
      s"catalog read planned ${LogTableScan.lastPlannedFiles.get()} of " +
        s"${LogTableScan.lastTotalFiles.get()} files — no manifest skipping")
    // time travel: VERSION AS OF v2 (post-first-INSERT snapshot)
    assert(spark.sql(
      "SELECT count(*) FROM graftcat.etl.orders VERSION AS OF 2").head().getLong(0) == 1000L)
    // catalog surface: SHOW TABLES / table existence / drop
    assert(spark.sql("SHOW TABLES IN graftcat.etl").collect()
      .map(_.getString(1)).contains("orders"))
    // CTAS commits empty v1 then appends the query result
    spark.sql("CREATE TABLE graftcat.etl.big_orders TBLPROPERTIES ('keyCol'='k') " +
      "AS SELECT k, v FROM graftcat.etl.orders WHERE k > 500")
    assert(spark.sql("SELECT count(*) FROM graftcat.etl.big_orders").head().getLong(0) == 505L)
    // ALTER TABLE ADD COLUMN = schema-evolution commit (the reference's
    // migrate_duckdb.py playbook): typed NULLs on old files, time travel
    // keeps the pre-ALTER shape, IF-NOT-EXISTS re-add is a no-op
    val preAlterV = LogTable.version(s"$wh/etl/orders")
    spark.sql("ALTER TABLE graftcat.etl.orders ADD COLUMN extra BIGINT")
    val altered = spark.sql("SELECT extra FROM graftcat.etl.orders WHERE k = 42")
    assert(altered.schema("extra").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(altered.head().isNullAt(0), "pre-ALTER rows must read extra as NULL")
    // time travel BEFORE the ALTER: the old schema, no extra column
    assert(!spark.sql(
      s"SELECT * FROM graftcat.etl.orders VERSION AS OF $preAlterV")
      .schema.fieldNames.contains("extra"))
    // same-type re-add: Spark's own analysis already rejects a SQL
    // re-add (no IF NOT EXISTS in its ALTER grammar), and the API-level
    // re-add (the reference's IF-NOT-EXISTS playbook shape) is a no-op
    // that commits nothing
    val vAfterAlter = LogTable.version(s"$wh/etl/orders")
    intercept[Exception](
      spark.sql("ALTER TABLE graftcat.etl.orders ADD COLUMN extra BIGINT"))
    LogTable.addColumns(spark, s"$wh/etl/orders",
      Seq(org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType)))
    assert(LogTable.version(s"$wh/etl/orders") == vAfterAlter,
      "re-adding an existing column must not commit")
    // same-name different-type: loud failure, not silent poison
    intercept[Exception](
      LogTable.addColumns(spark, s"$wh/etl/orders",
        Seq(org.apache.spark.sql.types.StructField("extra",
          org.apache.spark.sql.types.StringType))))
    // writes after the ALTER see the widened shape by name
    spark.sql("INSERT INTO graftcat.etl.orders SELECT 7777, 'alt', 123")
    assert(spark.sql("SELECT extra FROM graftcat.etl.orders WHERE k = 7777")
      .head().getLong(0) == 123L)
    // SQL RENAME COLUMN lands as a metadata-only column-mapping commit:
    // zero files rewritten, old data serves under the new name, and the
    // SQL scan reads through the mapping (the positive twin lives at the
    // end of this test so the INSERT paths above run unmapped)
    // multi-column ADD COLUMNS is ONE schema-evolution commit, not N
    val vBeforeMulti = LogTable.version(s"$wh/etl/orders")
    spark.sql("ALTER TABLE graftcat.etl.orders ADD COLUMNS (m1 DOUBLE, m2 STRING)")
    assert(LogTable.version(s"$wh/etl/orders") == vBeforeMulti + 1,
      "ADD COLUMNS (a, b) must land as one commit")
    val multi = spark.sql(
      "SELECT m1, m2 FROM graftcat.etl.orders WHERE k = 42").head()
    assert(multi.isNullAt(0) && multi.isNullAt(1))
    // evolution THROUGH SQL: a wider by-name insert via DataFrame API
    Seq((3000L, "w", 9L)).toDF("k", "v", "score")
      .write.format("graft-log").mode("append").save(s"$wh/etl/orders")
    assert(spark.sql("SELECT score FROM graftcat.etl.orders WHERE k = 3000")
      .head().getLong(0) == 9L)
    // SQL ALTER ... RENAME COLUMN: one metadata commit; data written
    // under the old name serves under the new one, through plain SQL
    val preRenameV = LogTable.version(s"$wh/etl/orders")
    spark.sql("ALTER TABLE graftcat.etl.orders RENAME COLUMN extra TO extra2")
    assert(LogTable.version(s"$wh/etl/orders") == preRenameV + 1,
      "RENAME COLUMN must land as ONE metadata-only commit")
    assert(spark.sql("SELECT extra2 FROM graftcat.etl.orders WHERE k = 7777")
      .head().getLong(0) == 123L)
    assert(!spark.sql("SELECT * FROM graftcat.etl.orders").schema
      .fieldNames.contains("extra"))
    // renames compose through SQL too (physical name stays the original)
    spark.sql("ALTER TABLE graftcat.etl.orders RENAME COLUMN extra2 TO extra3")
    assert(spark.sql("SELECT extra3 FROM graftcat.etl.orders WHERE k = 7777")
      .head().getLong(0) == 123L)
    spark.sql("DROP TABLE graftcat.etl.big_orders")
    assert(!spark.sql("SHOW TABLES IN graftcat.etl").collect()
      .map(_.getString(1)).contains("big_orders"))
  }

  test("ALTER TABLE DROP COLUMN: metadata-only narrow, time travel intact, re-add gated on physical purge") {
    val wh = Files.createTempDirectory("graft-logdropcol").toString
    spark.conf.set("spark.sql.catalog.graftdrop", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftdrop.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftdrop.etl")
    spark.sql("CREATE TABLE graftdrop.etl.t (k BIGINT, v STRING, aux BIGINT) " +
      "TBLPROPERTIES ('keyCol'='k')")
    spark.sql("INSERT INTO graftdrop.etl.t " +
      "SELECT id, CAST(id AS STRING), id * 10 FROM range(1, 6)")
    val path = s"$wh/etl/t"
    val preDropV = LogTable.version(path)
    spark.sql("ALTER TABLE graftdrop.etl.t DROP COLUMN aux")
    assert(LogTable.version(path) == preDropV + 1,
      "DROP COLUMN must land as ONE metadata-only commit")
    assert(spark.sql("SELECT * FROM graftdrop.etl.t").schema.fieldNames.toSeq ==
      Seq("k", "v"))
    // time travel below the drop still serves the column under its schema
    val old = spark.sql(s"SELECT * FROM graftdrop.etl.t VERSION AS OF $preDropV")
    assert(old.schema.fieldNames.contains("aux"))
    assert(old.filter("k = 1").head().getLong(2) == 10L)
    // the table IS narrower now: positional inserts match the new arity
    spark.sql("INSERT INTO graftdrop.etl.t SELECT 100, 'x'")
    assert(spark.sql("SELECT count(*) FROM graftdrop.etl.t").head().getLong(0) == 6L)
    // re-binding the name while live files still carry the bytes would
    // resurface old values instead of NULLs — refused with guidance
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graftdrop.etl.t ADD COLUMN aux BIGINT"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(_.contains("compact"))), e.toString)
    // compact rewrites under the committed schema -> the column purges
    // physically, the name frees, and old rows read the promised NULL
    spark.sql("CALL graftdrop.system.compact('etl.t', 100000)")
    spark.sql("ALTER TABLE graftdrop.etl.t ADD COLUMN aux BIGINT")
    assert(spark.sql("SELECT aux FROM graftdrop.etl.t WHERE k = 1").head().isNullAt(0),
      "a re-added column must read NULL, never the dropped values")
    // the key column cannot drop (keyed writes + manifest pruning use it)
    val ke = intercept[Exception](
      spark.sql("ALTER TABLE graftdrop.etl.t DROP COLUMN k"))
    assert(Iterator.iterate(ke: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(_.contains("key column"))), ke.toString)
  }

  test("write-batch resolution: any name overlap is by-name union, positional only on zero overlap") {
    val t = tmpTable()
    LogTable.create(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k")
    // MIXED batch (one matched name, one new, one table column missing is
    // impossible here — add a third column first): k matches, score is
    // new -> by-name evolution; v NULL-fills for the batch's rows
    Seq((10L, 99L)).toDF("k", "score")
      .write.format("graft-log").mode("append").save(t)
    val rows = load(t).filter(col("k") === 10L).collect()
    assert(rows.length == 1 && rows.head.isNullAt(1) && rows.head.getLong(2) == 99L,
      s"mixed by-name batch must evolve + NULL-fill, got ${rows.toSeq}")
    // old rows surface the evolved column as NULL
    assert(load(t).filter(col("k") === 1L).head().isNullAt(2))
    // a partial-name-match batch is NEVER resolved positionally: x lands
    // as a new column, k by name — not scattered into (k, v)
    Seq((123L, 20L)).toDF("x", "k")
      .write.format("graft-log").mode("append").save(t)
    val r20 = load(t).filter(col("k") === 20L).head()
    assert(r20.isNullAt(1) && r20.getLong(3) == 123L,
      s"partial-match batch must resolve by name, got $r20")
    // a DataFrame write sharing NO names with the table is a
    // misdirected write — loud error, never positional scattering
    val e = intercept[Exception](
      Seq(("40", "nope", "1", "2")).toDF("c1", "c2", "c3", "c4")
        .write.format("graft-log").mode("append").save(t))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("share no names"))))
    // CASE-mismatched names canonicalize onto the table's spelling: this
    // guard resolves case-insensitively (the Spark default users write
    // against) while append's evolution merge is exact-case, so passing
    // 'V' through would silently evolve a duplicate column and
    // NULL-fill the real one (the pre-fix behavior)
    Seq((30L, "cased")).toDF("K", "V")
      .write.format("graft-log").mode("append").save(t)
    val r30 = load(t).filter(col("k") === 30L).head()
    assert(r30.getString(1) == "cased",
      s"case-mismatched batch must land in the table's columns, got $r30")
    assert(!load(t).columns.contains("V"),
      s"case-mismatched batch evolved a duplicate column: ${load(t).columns.toSeq}")
    // a batch whose own columns collide case-insensitively cannot be
    // mapped — loud refusal, never a silent pick
    val ec = intercept[Exception](
      Seq((31L, "a", "b")).toDF("k", "v", "V")
        .write.format("graft-log").mode("append").save(t))
    assert(Iterator.iterate(ec: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("collide"))), s"$ec")
  }

  test("asOf beyond the head refuses instead of serving the head as invented history") {
    val t = tmpTable()
    LogTable.create(spark, t, Seq((1L, "a")).toDF("k", "v"), "k")
    val head = LogTable.version(t)
    val e = intercept[Exception](
      spark.read.format("graft-log").option("asOf", (head + 5).toString)
        .load(t).collect())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("does not exist"))), s"$e")
    assert(spark.read.format("graft-log").option("asOf", head.toString)
      .load(t).count() == 1L)
  }

  test("SQL INSERT is positional even when a SELECT alias coincides with a table column") {
    val wh = Files.createTempDirectory("graft-logpos").toString
    spark.conf.set("spark.sql.catalog.graftpos", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftpos.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftpos.etl")
    spark.sql("CREATE TABLE graftpos.etl.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('keyCol'='k')")
    // the second expression is aliased `k` — SQL semantics are BY
    // POSITION, so it must land in `v` (stringified), not evolve a
    // column or shift k; the first (named `id`) lands in k by position
    spark.sql("INSERT INTO graftpos.etl.t SELECT id, CAST(id AS STRING) AS k " +
      "FROM range(1, 4)")
    val rows = spark.sql("SELECT k, v FROM graftpos.etl.t ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "1"), (2L, "2"), (3L, "3")))
    assert(spark.sql("SELECT * FROM graftpos.etl.t").schema.fieldNames.toSeq ==
      Seq("k", "v"), "positional INSERT must not evolve the schema")
    // positional + ANSI cast: a string that can't narrow throws, as
    // ANSI INSERT requires
    val e = intercept[Exception](
      spark.sql("INSERT INTO graftpos.etl.t SELECT 'notanumber', 'x'"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(m =>
        m.contains("CAST") || m.contains("cast"))), e.toString)
    // INSERT OVERWRITE is positional the same way
    spark.sql("INSERT OVERWRITE graftpos.etl.t SELECT id, CAST(id AS STRING) AS k " +
      "FROM range(7, 9)")
    val ow = spark.sql("SELECT k, v FROM graftpos.etl.t ORDER BY k").collect()
    assert(ow.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((7L, "7"), (8L, "8")))
    // arity mismatch is the SQL column-count error, even when the extra
    // SELECT's names overlap the table (no silent by-name evolution)
    val arity = intercept[Exception](
      spark.sql("INSERT INTO graftpos.etl.t SELECT k, v, 42 FROM graftpos.etl.t"))
    assert(Iterator.iterate(arity: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(
        _.contains("INSERT_COLUMN_ARITY_MISMATCH"))), arity.toString)
    // and the subclass names the actual direction: an overlong SELECT is
    // "too many", not "not enough" (the misleading message sends the user
    // hunting for a column they have one too many of)
    assert(Iterator.iterate(arity: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(
        _.contains("TOO_MANY_DATA_COLUMNS"))), arity.toString)
    assert(spark.sql("SELECT * FROM graftpos.etl.t").schema.length == 2)
    val arity2 = intercept[Exception](
      spark.sql("INSERT INTO graftpos.etl.t SELECT 1"))
    assert(Iterator.iterate(arity2: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(
        _.contains("INSERT_COLUMN_ARITY_MISMATCH"))), arity2.toString)
    assert(Iterator.iterate(arity2: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(
        _.contains("NOT_ENOUGH_DATA_COLUMNS"))), arity2.toString)
  }

  test("SQL DELETE FROM rewrites only admitted files; TRUNCATE keeps the table") {
    val wh = Files.createTempDirectory("graft-logdel").toString
    spark.conf.set("spark.sql.catalog.graftdel", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftdel.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftdel.etl")
    spark.sql("CREATE TABLE graftdel.etl.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('keyCol'='k')")
    // 4 key-clustered files from 4 commits
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO graftdel.etl.t SELECT /*+ REPARTITION(1) */ " +
        s"id, concat('v', id) FROM range(${i * 1000}, ${i * 1000 + 1000})")
    val t = s"$wh/etl/t"
    val filesBefore = LogTable.read(spark, t).inputFiles.toSet
    assert(filesBefore.size == 4)
    // the delete window sits inside ONE file's key range: the other
    // three files must survive IDENTICALLY (no rewrite)
    spark.sql("DELETE FROM graftdel.etl.t WHERE k >= 1200 AND k < 1300")
    val filesAfter = LogTable.read(spark, t).inputFiles.toSet
    assert((filesBefore -- filesAfter).size == 1,
      s"delete rewrote ${(filesBefore -- filesAfter).size} files, expected 1")
    assert(spark.sql("SELECT count(*) FROM graftdel.etl.t").head().getLong(0) == 3900L)
    assert(spark.sql(
      "SELECT count(*) FROM graftdel.etl.t WHERE k BETWEEN 1200 AND 1299")
      .head().getLong(0) == 0L)
    // IN-list delete under the DEFAULT copy-on-write policy: the mode's
    // contract is a rewrite — no silent deletion vectors (vectors would
    // leave dead bytes and kill stats-only aggregates for users who
    // never opted into merge-on-read). The admitted files rewrite; the
    // untouched ones survive identically.
    val filesPreIn = LogTable.read(spark, t).inputFiles.toSet
    spark.sql("DELETE FROM graftdel.etl.t WHERE k IN (5, 2005)")
    val filesPostIn = LogTable.read(spark, t).inputFiles.toSet
    assert(filesPreIn != filesPostIn,
      "under copy-on-write a key-list DELETE must rewrite, not commit vectors")
    assert(LogTable.liveDvs(t, None).isEmpty,
      "copy-on-write DELETE silently committed deletion vectors")
    assert(spark.sql("SELECT count(*) FROM graftdel.etl.t").head().getLong(0) == 3898L)
    assert(spark.sql("SELECT count(*) FROM graftdel.etl.t WHERE k = 5")
      .head().getLong(0) == 0L)
    // Under the stored merge-on-read policy the same shape takes the
    // deletion-vector fast path: zero reads, ZERO rewrites — a metadata
    // commit — yet every read path serves the delete.
    spark.sql("ALTER TABLE graftdel.etl.t SET TBLPROPERTIES ('rowLevel'='merge-on-read')")
    val filesPreDv = LogTable.read(spark, t).inputFiles.toSet
    spark.sql("DELETE FROM graftdel.etl.t WHERE k IN (6, 2006)")
    assert(LogTable.read(spark, t).inputFiles.toSet == filesPreDv,
      "a small key-list DELETE under merge-on-read must be a deletion-vector commit")
    assert(spark.sql("SELECT count(*) FROM graftdel.etl.t").head().getLong(0) == 3896L)
    assert(spark.sql("SELECT count(*) FROM graftdel.etl.t WHERE k = 6")
      .head().getLong(0) == 0L)
    spark.sql("ALTER TABLE graftdel.etl.t UNSET TBLPROPERTIES ('rowLevel')")
    // string predicate delete translates too (copy-on-write path; it
    // must compose with the vector the merge-on-read delete committed)
    spark.sql("DELETE FROM graftdel.etl.t WHERE v = 'v3999'")
    assert(spark.sql("SELECT count(*) FROM graftdel.etl.t").head().getLong(0) == 3895L)
    assert(spark.sql("SELECT count(*) FROM graftdel.etl.t WHERE k = 2006")
      .head().getLong(0) == 0L,
      "the copy-on-write rewrite resurrected a vector-deleted row")
    // TRUNCATE drops every row, keeps table + schema + key property
    spark.sql("TRUNCATE TABLE graftdel.etl.t")
    assert(spark.sql("SELECT count(*) FROM graftdel.etl.t").head().getLong(0) == 0L)
    assert(LogTable.tableKeyCol(t).contains("k"))
    spark.sql("INSERT INTO graftdel.etl.t SELECT 1, 'back'")
    assert(spark.sql("SELECT v FROM graftdel.etl.t").head().getString(0) == "back")
  }

  test("SQL UPDATE and MERGE INTO run as group-based rewrites of the scanned files") {
    val wh = Files.createTempDirectory("graft-logupd").toString
    spark.conf.set("spark.sql.catalog.graftupd", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftupd.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftupd.etl")
    spark.sql("CREATE TABLE graftupd.etl.t (k BIGINT, v STRING, n BIGINT) " +
      "TBLPROPERTIES ('keyCol'='k')")
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO graftupd.etl.t SELECT /*+ REPARTITION(1) */ " +
        s"id, concat('v', id), 0 FROM range(${i * 1000}, ${i * 1000 + 1000})")
    val t = s"$wh/etl/t"
    val filesBefore = LogTable.read(spark, t).inputFiles.toSet
    assert(filesBefore.size == 4)
    // UPDATE windowed inside one file: only that file rewrites
    spark.sql("UPDATE graftupd.etl.t SET n = 7, v = 'upd' " +
      "WHERE k >= 2100 AND k < 2200")
    val filesAfter = LogTable.read(spark, t).inputFiles.toSet
    assert((filesBefore -- filesAfter).size == 1,
      s"UPDATE rewrote ${(filesBefore -- filesAfter).size} files, expected 1")
    assert(spark.sql("SELECT count(*) FROM graftupd.etl.t WHERE n = 7")
      .head().getLong(0) == 100L)
    assert(spark.sql("SELECT count(*) FROM graftupd.etl.t").head().getLong(0) == 4000L)
    // untouched rows of the rewritten file survive unchanged
    assert(spark.sql(
      "SELECT v FROM graftupd.etl.t WHERE k = 2000").head().getString(0) == "v2000")
    // MERGE INTO: matched rows update, unmatched insert (upsert by key)
    spark.sql("SELECT id AS k, concat('m', id) AS v, CAST(9 AS BIGINT) AS n " +
      "FROM range(3995, 4005)").createOrReplaceTempView("merge_src")
    spark.sql("""MERGE INTO graftupd.etl.t AS tgt USING merge_src AS src
      |ON tgt.k = src.k
      |WHEN MATCHED THEN UPDATE SET v = src.v, n = src.n
      |WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (src.k, src.v, src.n)
      |""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graftupd.etl.t").head().getLong(0) == 4005L)
    assert(spark.sql("SELECT count(*) FROM graftupd.etl.t WHERE n = 9")
      .head().getLong(0) == 10L)
    assert(spark.sql(
      "SELECT v FROM graftupd.etl.t WHERE k = 4002").head().getString(0) == "m4002")
    // history is commits, not mutations: the pre-UPDATE snapshot still reads
    val preUpdate = LogTable.version(t) - 2
    assert(spark.sql(
      s"SELECT count(*) FROM graftupd.etl.t VERSION AS OF $preUpdate " +
        "WHERE n <> 0").head().getLong(0) == 0L)
  }

  test("_file metadata column: selectable, hidden from *, correct per file") {
    val t = tmpTable()
    LogTable.create(spark, t,
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(2, col("k")), "k")
    val df = load(t)
    assert(!df.schema.fieldNames.contains("_file"), "* must hide _file")
    assert(df.select(col("_file")).distinct().count() == 2L)
    // the value is the manifest file name: joining back through the
    // manifest's key ranges must agree with the row's key
    val rows = df.select(col("k"), col("_file")).collect()
    val byFile = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)))
    byFile.foreach { case (f, ks) =>
      assert(f.endsWith(".parquet"))
      // repartitionByRange(2): each file holds a contiguous key range
      assert(ks.max - ks.min < 100L)
    }
    // count over only the metadata column still reads zero data pages
    assert(df.select(col("_file")).count() == 100L)
  }

  test("runtime group filtering: MERGE and subquery-UPDATE rewrite only files holding matched keys") {
    val wh = Files.createTempDirectory("graft-loggf").toString
    spark.conf.set("spark.sql.catalog.graftgf", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftgf.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftgf.etl")
    spark.sql("CREATE TABLE graftgf.etl.t (k BIGINT, v STRING, n BIGINT) " +
      "TBLPROPERTIES ('keyCol'='k')")
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO graftgf.etl.t SELECT /*+ REPARTITION(1) */ " +
        s"id, concat('v', id), 0 FROM range(${i * 1000}, ${i * 1000 + 1000})")
    val t = s"$wh/etl/t"
    val filesBefore = LogTable.read(spark, t).inputFiles.toSet
    assert(filesBefore.size == 4)
    // MERGE matching 10 keys inside ONE file's range: the runtime
    // group-filter subquery (distinct _file of matched rows) must
    // shrink the rewrite to that file — the other three survive
    // IDENTICALLY. Without SupportsRuntimeV2Filtering this was 4.
    spark.sql("SELECT id AS k, concat('m', id) AS v, CAST(9 AS BIGINT) AS n " +
      "FROM range(3100, 3110)").createOrReplaceTempView("gf_src")
    spark.sql("""MERGE INTO graftgf.etl.t AS tgt USING gf_src AS src
      |ON tgt.k = src.k
      |WHEN MATCHED THEN UPDATE SET v = src.v, n = src.n
      |WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (src.k, src.v, src.n)
      |""".stripMargin)
    val afterMerge = LogTable.read(spark, t).inputFiles.toSet
    assert((filesBefore -- afterMerge).size == 1,
      s"MERGE rewrote ${(filesBefore -- afterMerge).size} files, expected 1")
    assert(spark.sql("SELECT count(*) FROM graftgf.etl.t WHERE n = 9")
      .head().getLong(0) == 10L)
    assert(spark.sql("SELECT count(*) FROM graftgf.etl.t").head().getLong(0) == 4000L)
    // UPDATE with an IN-subquery predicate (not statically pushable):
    // runtime group filtering prunes the same way
    spark.sql("SELECT id AS kk FROM range(500, 505)")
      .createOrReplaceTempView("gf_upd_keys")
    spark.sql("UPDATE graftgf.etl.t SET v = 'sub' " +
      "WHERE k IN (SELECT kk FROM gf_upd_keys)")
    val afterUpd = LogTable.read(spark, t).inputFiles.toSet
    assert((afterMerge -- afterUpd).size == 1,
      s"subquery UPDATE rewrote ${(afterMerge -- afterUpd).size} files, expected 1")
    assert(spark.sql("SELECT count(*) FROM graftgf.etl.t WHERE v = 'sub'")
      .head().getLong(0) == 5L)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: full-sync semantics, windowed by the action condition") {
    val wh = Files.createTempDirectory("graft-lognmbs").toString
    spark.conf.set("spark.sql.catalog.graftnmbs", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftnmbs.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftnmbs.etl")
    spark.sql("CREATE TABLE graftnmbs.etl.t (k BIGINT, v STRING, n BIGINT) " +
      "TBLPROPERTIES ('keyCol'='k')")
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO graftnmbs.etl.t SELECT /*+ REPARTITION(1) */ " +
        s"id, concat('v', id), 0 FROM range(${i * 1000}, ${i * 1000 + 1000})")
    // the reference's replace-all-items shape (K3): the source is the
    // COMPLETE new image of window [2000, 3000) — evens updated, odds
    // (absent from the source) deleted; rows outside the window and
    // unmatched-by-source keep out of the sync via the action condition
    spark.sql("SELECT id AS k, concat('s', id) AS v, CAST(1 AS BIGINT) AS n " +
      "FROM range(2000, 3000, 2)").createOrReplaceTempView("nmbs_src")
    spark.sql("""MERGE INTO graftnmbs.etl.t AS tgt USING nmbs_src AS src
      |ON tgt.k = src.k
      |WHEN MATCHED THEN UPDATE SET v = src.v, n = src.n
      |WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (src.k, src.v, src.n)
      |WHEN NOT MATCHED BY SOURCE AND tgt.k >= 2000 AND tgt.k < 3000 THEN DELETE
      |""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graftnmbs.etl.t").head().getLong(0) == 3500L)
    assert(spark.sql(
      "SELECT count(*) FROM graftnmbs.etl.t WHERE k >= 2000 AND k < 3000")
      .head().getLong(0) == 500L)
    assert(spark.sql("SELECT count(*) FROM graftnmbs.etl.t WHERE n = 1")
      .head().getLong(0) == 500L)
    // untouched windows are byte-identical rows
    assert(spark.sql(
      "SELECT v FROM graftnmbs.etl.t WHERE k = 100").head().getString(0) == "v100")
    // NOTE on pruning: NOT MATCHED BY SOURCE makes EVERY target group a
    // candidate (an unmatched row can live anywhere), so Spark plans a
    // full-table rewrite — runtime group filtering correctly does not
    // apply. That is the industry-wide COW semantics for this verb, and
    // the windowed action condition bounds the DELETED rows, not the
    // rewritten files.
  }

  test("INSERT OVERWRITE and mode(overwrite) are versioned replace-all commits, history intact") {
    val wh = Files.createTempDirectory("graft-logow").toString
    spark.conf.set("spark.sql.catalog.graftow", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftow.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftow.etl")
    spark.sql("CREATE TABLE graftow.etl.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('keyCol'='k')")
    spark.sql("INSERT INTO graftow.etl.t SELECT id, 'a' FROM range(0, 100)")
    val t = s"$wh/etl/t"
    val preOverwrite = LogTable.version(t)
    // SQL INSERT OVERWRITE: contents replaced in ONE commit
    spark.sql("INSERT OVERWRITE graftow.etl.t SELECT id, 'b' FROM range(0, 10)")
    assert(LogTable.version(t) == preOverwrite + 1,
      "overwrite must be one versioned commit")
    assert(spark.sql("SELECT count(*) FROM graftow.etl.t").head().getLong(0) == 10L)
    assert(spark.sql("SELECT DISTINCT v FROM graftow.etl.t").head().getString(0) == "b")
    // time travel to the pre-overwrite snapshot still serves it
    assert(spark.sql(
      s"SELECT count(*) FROM graftow.etl.t VERSION AS OF $preOverwrite")
      .head().getLong(0) == 100L)
    // DataFrame mode("overwrite"): same verb on the path API
    Seq((7L, "c")).toDF("k", "v")
      .write.format("graft-log").mode("overwrite").save(t)
    assert(LogTable.read(spark, t).count() == 1L)
    assert(LogTable.read(spark, t).head().getString(1) == "c")
    // appends continue normally after an overwrite
    spark.sql("INSERT INTO graftow.etl.t SELECT 8, 'd'")
    assert(spark.sql("SELECT count(*) FROM graftow.etl.t").head().getLong(0) == 2L)
  }

  test("TIMESTAMP AS OF resolves against stamped commit times") {
    val wh = Files.createTempDirectory("graft-logts").toString
    spark.conf.set("spark.sql.catalog.graftts", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftts.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftts.etl")
    spark.sql("CREATE TABLE graftts.etl.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('keyCol'='k')")
    val t0 = System.currentTimeMillis()
    Thread.sleep(15)
    spark.sql("INSERT INTO graftts.etl.t SELECT id, 'a' FROM range(0, 100)")
    Thread.sleep(15)
    val t1 = System.currentTimeMillis()
    Thread.sleep(15)
    spark.sql("INSERT INTO graftts.etl.t SELECT id, 'b' FROM range(100, 150)")
    Thread.sleep(15)
    val t2 = System.currentTimeMillis()
    def iso(ms: Long) = java.time.Instant.ofEpochMilli(ms).toString
    assert(spark.sql(
      s"SELECT count(*) FROM graftts.etl.t TIMESTAMP AS OF '${iso(t1)}'")
      .head().getLong(0) == 100L)
    assert(spark.sql(
      s"SELECT count(*) FROM graftts.etl.t TIMESTAMP AS OF '${iso(t2)}'")
      .head().getLong(0) == 150L)
    // between CREATE and the first insert: the empty v1 snapshot
    assert(spark.sql(
      s"SELECT count(*) FROM graftts.etl.t TIMESTAMP AS OF '${iso(t0)}'")
      .head().getLong(0) == 0L)
    // before the table existed: loud failure, not invented history
    val e = intercept[Exception](spark.sql(
      s"SELECT count(*) FROM graftts.etl.t TIMESTAMP AS OF '${iso(t0 - 60000)}'")
      .collect())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(_.contains("predates"))))
    // the Scala resolution agrees with the SQL path
    assert(LogTable.versionAtTimestamp(s"$wh/etl/t", t1) == 2L)
    assert(LogTable.versionAtTimestamp(s"$wh/etl/t", t2) == 3L)
    // the DataFrame-path twin: .option("asOfTimestamp", ...) — epoch
    // millis or ISO-8601 instant, exclusive with asOf
    assert(spark.read.format("graft-log").option("asOfTimestamp", t1.toString)
      .load(s"$wh/etl/t").count() == 100L)
    assert(spark.read.format("graft-log").option("asOfTimestamp", iso(t2))
      .load(s"$wh/etl/t").count() == 150L)
    intercept[IllegalArgumentException](
      spark.read.format("graft-log").option("asOf", "1")
        .option("asOfTimestamp", t1.toString).load(s"$wh/etl/t"))
  }

  test("CALL system.restore rolls contents back as a new commit, history intact") {
    val wh = Files.createTempDirectory("graft-logrst").toString
    spark.conf.set("spark.sql.catalog.graftrst", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftrst.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftrst.etl")
    spark.sql("CREATE TABLE graftrst.etl.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('keyCol'='k')")
    spark.sql("INSERT INTO graftrst.etl.t SELECT id, 'a' FROM range(0, 100)")
    val goodV = LogTable.version(s"$wh/etl/t")
    // two "mistaken" commits: a bad append and a destructive overwrite
    spark.sql("INSERT INTO graftrst.etl.t SELECT id, 'oops' FROM range(500, 600)")
    spark.sql("INSERT OVERWRITE graftrst.etl.t SELECT 1, 'wiped'")
    assert(spark.sql("SELECT count(*) FROM graftrst.etl.t").head().getLong(0) == 1L)
    val headBefore = LogTable.version(s"$wh/etl/t")
    val r = spark.sql(s"CALL graftrst.system.restore('etl.t', $goodV)").collect()
    assert(r.length == 1 && r.head.getLong(1) == 100L, s"restore summary: ${r.toSeq}")
    // contents are the good snapshot again, via a NEW version
    assert(LogTable.version(s"$wh/etl/t") == headBefore + 1)
    assert(spark.sql("SELECT count(*) FROM graftrst.etl.t").head().getLong(0) == 100L)
    assert(spark.sql("SELECT count(*) FROM graftrst.etl.t WHERE v = 'a'")
      .head().getLong(0) == 100L)
    // the mistaken history is STILL time-travelable (restore is not erasure)
    assert(spark.sql(
      s"SELECT count(*) FROM graftrst.etl.t VERSION AS OF $headBefore")
      .head().getLong(0) == 1L)
    // writes continue normally on top of the restore
    spark.sql("INSERT INTO graftrst.etl.t SELECT 1000, 'after'")
    assert(spark.sql("SELECT count(*) FROM graftrst.etl.t").head().getLong(0) == 101L)
    // below a truncation checkpoint: loud refusal
    spark.sql("CALL graftrst.system.truncate_history('etl.t', 0, 0)")
    val e = intercept[Exception](
      spark.sql(s"CALL graftrst.system.restore('etl.t', $goodV)").collect())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(_.contains("truncation"))), e.toString)
  }

  test("CALL system.clone creates an independent catalog table from a snapshot") {
    val wh = Files.createTempDirectory("graft-logclone").toString
    spark.conf.set("spark.sql.catalog.graftclone", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftclone.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftclone.etl")
    spark.sql("CREATE TABLE graftclone.etl.src (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('keyCol'='k')")
    spark.sql("INSERT INTO graftclone.etl.src " +
      "SELECT id, CAST(id AS STRING) FROM range(1, 11)") // v2
    spark.sql("INSERT INTO graftclone.etl.src SELECT 100, 'x'") // v3
    val res = spark.sql(
      "CALL graftclone.system.clone('etl.src', 'etl.dst')").head()
    assert(res.getLong(1) == 11L, s"clone summary: $res")
    assert(spark.sql("SELECT count(*) FROM graftclone.etl.dst")
      .head().getLong(0) == 11L)
    assert(spark.sql("SHOW TABLES IN graftclone.etl").collect()
      .map(_.getString(1)).contains("dst"))
    // version-pinned clone: the pre-v3 snapshot
    spark.sql("CALL graftclone.system.clone('etl.src', 'etl.dst2', 2)")
    assert(spark.sql("SELECT count(*) FROM graftclone.etl.dst2")
      .head().getLong(0) == 10L)
    // independence both ways
    spark.sql("INSERT INTO graftclone.etl.dst SELECT 200, 'y'")
    assert(spark.sql("SELECT count(*) FROM graftclone.etl.src")
      .head().getLong(0) == 11L)
    spark.sql("DELETE FROM graftclone.etl.src WHERE k = 100")
    assert(spark.sql("SELECT count(*) FROM graftclone.etl.dst")
      .head().getLong(0) == 12L)
    // cloning onto an existing table fails loudly
    intercept[Exception](
      spark.sql("CALL graftclone.system.clone('etl.src', 'etl.dst')"))
  }

  test("LogCatalog procedures: CALL system.compact/vacuum/truncate_history run maintenance from SQL") {
    val wh = Files.createTempDirectory("graft-logproc").toString
    spark.conf.set("spark.sql.catalog.graftproc", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftproc.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftproc.etl")
    spark.sql("CREATE TABLE graftproc.etl.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('keyCol'='k')")
    // 5 small appends -> 5 files, fragmented
    for (i <- 0 until 5)
      spark.sql(s"INSERT INTO graftproc.etl.t SELECT id, concat('v', id) " +
        s"FROM range(${i * 100}, ${i * 100 + 100})")
    val t = s"$wh/etl/t"
    assert(LogTable.read(spark, t).inputFiles.length >= 5)
    // compact bin-packs to one file; count survives
    val c = spark.sql("CALL graftproc.system.compact('etl.t', 100000)").collect()
    assert(c.length == 1 && c.head.getInt(0) >= 5 && c.head.getInt(1) == 1,
      s"compact summary: ${c.toSeq}")
    assert(spark.sql("SELECT count(*) FROM graftproc.etl.t").head().getLong(0) == 500L)
    // truncate_history checkpoints + drops old manifests, vacuums files
    val th = spark.sql(
      "CALL graftproc.system.truncate_history('etl.t', 0, 0)").collect()
    assert(th.length == 1 && th.head.getInt(0) > 0,
      s"truncate_history summary: ${th.toSeq}")
    assert(spark.sql("SELECT count(*) FROM graftproc.etl.t").head().getLong(0) == 500L)
    // vacuum on a clean table removes nothing
    val v = spark.sql("CALL graftproc.system.vacuum('etl.t', 0)").collect()
    assert(v.length == 1 && v.head.getInt(0) == 0, s"vacuum summary: ${v.toSeq}")
    // create_changelog_view: the CDC feed from SQL — a temp view over
    // the DISTRIBUTED changes frame (driver holds only the summary row)
    val preV = LogTable.version(t)
    spark.sql("INSERT INTO graftproc.etl.t SELECT id, concat('n', id) " +
      "FROM range(9000, 9010)")
    val cv = spark.sql(
      s"CALL graftproc.system.create_changelog_view('etl.t', $preV)").collect()
    assert(cv.length == 1 && cv.head.getString(0) == "etl_t_changes" &&
      cv.head.getLong(1) == preV, s"changelog summary: ${cv.toSeq}")
    val delta = spark.sql("SELECT * FROM etl_t_changes")
    assert(delta.count() == 10L)
    assert(delta.filter(col("_change_type") =!= "insert").count() == 0L)
    assert(spark.sql(
      "SELECT min(k), max(k) FROM etl_t_changes").head().toSeq == Seq(9000L, 9009L))
    // snapshots: the commit history from the manifests, one row per
    // version still present (truncate_history above left one checkpoint
    // + the changelog-feeding insert)
    val snaps = spark.sql("CALL graftproc.system.snapshots('etl.t')").collect()
    assert(snaps.length == LogTable.version(t) - snaps.head.getLong(0) + 1,
      s"history rows must be contiguous to the head: ${snaps.toSeq}")
    assert(snaps.head.getBoolean(5), "oldest surviving version is the checkpoint")
    assert(snaps.map(_.getLong(3)).sum >= 500L)
    assert(snaps.forall(!_.isNullAt(1)), "every commit carries its wall-clock")
    // table properties reach DESCRIBE EXTENDED / SHOW TBLPROPERTIES
    val props = spark.sql("SHOW TBLPROPERTIES graftproc.etl.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("keyCol").contains("k"), props.toString)
    assert(props.get("format").contains("graft-log"))
    assert(props.get("version").contains(LogTable.version(t).toString))
    // unknown procedure fails to resolve (our message naming the
    // available set rides the cause chain under Spark's
    // FAILED_TO_LOAD_ROUTINE wrapper)
    val e = intercept[Exception](spark.sql("CALL graftproc.system.nope()"))
    val messages = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(messages.contains("FAILED_TO_LOAD_ROUTINE") ||
      messages.contains("compact"), messages)
  }

  test("manifest row statistics reach the optimizer: a pruned log read broadcasts on its own") {
    val t = tmpTable()
    LogTable.create(spark, t,
      (1L to 8000L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(8, col("k")), "k")
    val dim = load(t).filter(col("k") <= 900L) // ~1 file, ~900 rows by stats
    val fact = (1L to 4000L).map(i => (i, i % 1000L)).toDF("fk", "k")
    val joined = fact.join(dim, Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"pruned connector read (stats ~900 rows) did not broadcast:\n$plan")
    assert(joined.count() == fact.filter(col("k").between(1L, 900L)).count())
  }

  // ---- aggregate pushdown: COUNT/MIN/MAX from manifest stats ----

  private def aggTable(): (String, org.apache.spark.sql.DataFrame) = {
    val t = tmpTable()
    val base = (1L to 6000L)
      .map(i => (i, if (i % 3 == 0) null else s"v$i", i / 10.0))
      .toDF("k", "nv", "score")
      .withColumn("ts", timestamp_seconds(col("k") * 60))
      .withColumn("d", to_date(timestamp_seconds(col("k") * 86400)))
      .repartitionByRange(6, col("k"))
    LogTable.create(spark, t, base, "k")
    (t, base)
  }

  test("unfiltered COUNT/MIN/MAX answer from manifest stats with zero files planned") {
    val (t, base) = aggTable()
    val got = load(t).agg(
      count(lit(1)).as("n"), count(col("nv")).as("nn"),
      min(col("k")).as("mnk"), max(col("k")).as("mxk"),
      min(col("ts")).as("mnts"), max(col("ts")).as("mxts"),
      min(col("d")).as("mnd"), max(col("d")).as("mxd"),
      min(col("score")).as("mns")).collect().toSeq
    val expected = base.agg(
      count(lit(1)), count(col("nv")), min(col("k")), max(col("k")),
      min(col("ts")), max(col("ts")), min(col("d")), max(col("d")),
      min(col("score"))).collect().toSeq
    assert(got == expected, s"stats aggregate diverged: $got vs $expected")
    assert(LogTableScan.lastPlannedFiles.get() == 0,
      s"pushed aggregation planned ${LogTableScan.lastPlannedFiles.get()} " +
        "data files — the manifest should have been the whole read")
    val desc = load(t).agg(count(lit(1))).queryExecution.executedPlan.toString
    assert(desc.contains("agg=[count(*)]"),
      s"scan description does not report the pushed aggregation:\n$desc")
  }

  test("floating MAX refuses stats (NaN hazard) and scans; NaN answers NaN") {
    val t = tmpTable()
    LogTable.create(spark, t,
      Seq((1L, 1.5), (2L, Double.NaN), (3L, -3.25))
        .toDF("k", "score").coalesce(1), "k")
    val got = load(t).agg(max(col("score"))).collect()(0).getDouble(0)
    assert(got.isNaN, s"max over a NaN-holding file must be NaN, got $got")
    assert(LogTableScan.lastPlannedFiles.get() > 0,
      "floating max must fall back to the scan — footer bounds exclude NaN")
    // min over the same data IS answerable when stats exist; a
    // NaN-holding file drops its colsD stats entirely, so this also
    // falls back — and still answers the exact minimum
    val mn = load(t).agg(min(col("score"))).collect()(0).getDouble(0)
    assert(mn == -3.25)
  }

  test("filtered aggregates fall back to the pruned scan and stay exact") {
    val (t, base) = aggTable()
    val got = load(t).filter(col("k") > 3000L)
      .agg(count(lit(1)), min(col("k"))).collect().toSeq
    val expected = base.filter(col("k") > 3000L)
      .agg(count(lit(1)), min(col("k"))).collect().toSeq
    assert(got == expected)
    assert(LogTableScan.lastPlannedFiles.get() > 0,
      "a filtered aggregate must read files — stats describe whole files")
  }

  test("distinct and unsupported aggregates refuse pushdown but stay exact") {
    val (t, base) = aggTable()
    val got = load(t)
      .agg(countDistinct(col("nv")), sum(col("k")), avg(col("score")))
      .collect()(0)
    val expected = base
      .agg(countDistinct(col("nv")), sum(col("k")), avg(col("score")))
      .collect()(0)
    assert(got.getLong(0) == expected.getLong(0) &&
      got.getLong(1) == expected.getLong(1))
    // double avg: accumulation order differs between the two plans —
    // compare to FP tolerance, not bit-exactly
    assert(math.abs(got.getDouble(2) - expected.getDouble(2)) < 1e-9,
      s"avg diverged beyond FP reassociation: $got vs $expected")
    assert(LogTableScan.lastPlannedFiles.get() > 0)
  }

  test("stats-less columns refuse: a column added by evolution falls back") {
    val (t, base) = aggTable()
    LogTable.addColumns(spark, t,
      Seq(org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType)))
    // count(extra) has no null counts for pre-ALTER files -> scan; the
    // typed-NULL evolution semantics still answer 0 non-null rows
    val cnt = load(t).agg(count(col("extra"))).collect()(0).getLong(0)
    assert(cnt == 0L)
    assert(LogTableScan.lastPlannedFiles.get() > 0)
    // count(*) remains pure stats arithmetic after the evolution commit
    val n = load(t).agg(count(lit(1))).collect()(0).getLong(0)
    assert(n == base.count())
    assert(LogTableScan.lastPlannedFiles.get() == 0)
  }

  test("emptied table answers count 0 and NULL bounds from the manifest alone") {
    val (t, _) = aggTable()
    LogTable.deleteWhere(spark, t, _ => true, lit(true))
    val row = load(t).agg(count(lit(1)), min(col("k")), max(col("ts"))).collect()(0)
    assert(row.getLong(0) == 0L)
    assert(row.isNullAt(1) && row.isNullAt(2),
      "min/max over an emptied snapshot must answer SQL's zero-row NULL")
    assert(LogTableScan.lastPlannedFiles.get() == 0)
  }

  test("aggregate pushdown respects time travel: asOf answers that version's stats") {
    val t = tmpTable()
    LogTable.create(spark, t,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("k", "score"), "k")
    val v1 = graft.io.LogTable.version(t)
    LogTable.upsert(spark, t,
      (101L to 250L).map(i => (i, i * 1.0)).toDF("k", "score"), "k")
    val got = spark.read.format("graft-log").option("asOf", v1).load(t)
      .agg(count(lit(1)), max(col("k"))).collect()(0)
    assert(got.getLong(0) == 100L && got.getLong(1) == 100L)
    assert(LogTableScan.lastPlannedFiles.get() == 0)
    val head = load(t).agg(count(lit(1)), max(col("k"))).collect()(0)
    assert(head.getLong(0) == 250L && head.getLong(1) == 250L)
  }

  test("merge-on-read mode: SQL UPDATE/MERGE/DELETE commit deletion vectors — zero files rewritten") {
    val wh = Files.createTempDirectory("graft-logmor").toString
    spark.conf.set("spark.sql.catalog.graftmor", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftmor.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftmor.etl")
    spark.sql("CREATE TABLE graftmor.etl.t (k BIGINT, v STRING, n BIGINT) " +
      "TBLPROPERTIES ('keyCol'='k')")
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO graftmor.etl.t SELECT /*+ REPARTITION(1) */ " +
        s"id, concat('v', id), 0 FROM range(${i * 1000}, ${i * 1000 + 1000})")
    val t = s"$wh/etl/t"
    val original = LogTable.read(spark, t).inputFiles.toSet
    assert(original.size == 4)
    val vPreUpdate = graft.io.LogTable.version(t)
    spark.conf.set("spark.graft.rowLevel.mode", "merge-on-read")
    try {
      // plan-shape gate: under the mode the statement plans as a DELTA
      // write (WriteDelta), not a group rewrite (ReplaceData)
      val planned = spark.sql(
        "EXPLAIN UPDATE graftmor.etl.t SET n = 0 WHERE k < 0")
        .head().getString(0)
      assert(planned.contains("WriteDelta"),
        s"expected a WriteDelta plan under merge-on-read, got:\n$planned")
      // UPDATE: dead keys become per-file vectors, images append — the
      // four original files must ALL survive untouched
      spark.sql("UPDATE graftmor.etl.t SET n = 7, v = 'upd' " +
        "WHERE k >= 2100 AND k < 2200")
      val afterUpd = LogTable.read(spark, t).inputFiles.toSet
      assert(original.subsetOf(afterUpd),
        "merge-on-read UPDATE rewrote a data file")
      assert((afterUpd -- original).size == 1, "expected ONE appended part")
      val dvs1 = graft.io.LogTable.liveDvs(t, None)
      assert(dvs1.values.map(_.size).sum == 100,
        s"UPDATE must vector exactly its 100 matched keys, got $dvs1")
      // the vector is PRECISE: one file holds [2100, 2200)
      assert(dvs1.size == 1, "dead keys leaked onto files that never held them")
      assert(spark.sql("SELECT count(*) FROM graftmor.etl.t WHERE n = 7")
        .head().getLong(0) == 100L)
      assert(spark.sql("SELECT count(*) FROM graftmor.etl.t")
        .head().getLong(0) == 4000L)
      assert(spark.sql("SELECT v FROM graftmor.etl.t WHERE k = 2000")
        .head().getString(0) == "v2000")
      // MERGE: matched update + unmatched insert, still zero rewrites
      spark.sql("SELECT id AS k, concat('m', id) AS v, CAST(9 AS BIGINT) AS n " +
        "FROM range(3995, 4005)").createOrReplaceTempView("mor_src")
      spark.sql("""MERGE INTO graftmor.etl.t AS tgt USING mor_src AS src
        |ON tgt.k = src.k
        |WHEN MATCHED THEN UPDATE SET v = src.v, n = src.n
        |WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (src.k, src.v, src.n)
        |""".stripMargin)
      assert(original.subsetOf(LogTable.read(spark, t).inputFiles.toSet),
        "merge-on-read MERGE rewrote a data file")
      assert(spark.sql("SELECT count(*) FROM graftmor.etl.t")
        .head().getLong(0) == 4005L)
      assert(spark.sql("SELECT count(*) FROM graftmor.etl.t WHERE n = 9")
        .head().getLong(0) == 10L)
      assert(spark.sql("SELECT v FROM graftmor.etl.t WHERE k = 4002")
        .head().getString(0) == "m4002")
      // non-key-list DELETE: under merge-on-read it must NOT take the
      // metadata-delete rewrite — the delta plan vectors the row
      spark.sql("DELETE FROM graftmor.etl.t WHERE v = 'v10'")
      assert(original.subsetOf(LogTable.read(spark, t).inputFiles.toSet),
        "merge-on-read DELETE rewrote a data file")
      assert(spark.sql("SELECT count(*) FROM graftmor.etl.t")
        .head().getLong(0) == 4004L)
      // key-list DELETE keeps the zero-read fast path under this mode
      spark.sql("DELETE FROM graftmor.etl.t WHERE k IN (20, 3000)")
      assert(spark.sql("SELECT count(*) FROM graftmor.etl.t")
        .head().getLong(0) == 4002L)
      // updated-then-merged key: latest image wins everywhere
      assert(spark.sql("SELECT v FROM graftmor.etl.t WHERE k = 2150")
        .head().getString(0) == "upd")
      // KEY-reassigning UPDATE: legal under the delta split (updates run
      // as delete+insert) — the old identity vectors dead, the new one
      // appends; total count holds
      spark.sql("UPDATE graftmor.etl.t SET k = 90001 WHERE k = 42")
      assert(spark.sql("SELECT count(*) FROM graftmor.etl.t WHERE k = 42")
        .head().getLong(0) == 0L)
      assert(spark.sql("SELECT v FROM graftmor.etl.t WHERE k = 90001")
        .head().getString(0) == "v42")
      assert(spark.sql("SELECT count(*) FROM graftmor.etl.t")
        .head().getLong(0) == 4002L)
      // observability: each vector commit reports its dead-key count
      // through CALL system.snapshots (the compact()-pressure signal)
      val dvCommits = spark.sql("CALL graftmor.system.snapshots('etl.t')")
        .filter(col("dv_keys") > 0).collect()
      assert(dvCommits.length >= 4,
        s"UPDATE/MERGE/DELETE/key-list-DELETE must each report dv_keys: " +
          s"${dvCommits.length}")
      // history: the pre-UPDATE version still reads vector-free
      assert(spark.sql(s"SELECT count(*) FROM graftmor.etl.t " +
        s"VERSION AS OF $vPreUpdate WHERE n <> 0").head().getLong(0) == 0L)
      // compact() purges the vectors and drops the dead bytes
      graft.io.LogTable.compact(spark, t, "k", targetRows = 10000L)
      assert(graft.io.LogTable.liveDvs(t, None).isEmpty)
      assert(spark.sql("SELECT count(*) FROM graftmor.etl.t")
        .head().getLong(0) == 4002L)
      // no delete touched [2100, 2200): all 100 updated rows survive
      assert(spark.sql("SELECT count(*) FROM graftmor.etl.t WHERE n = 7")
        .head().getLong(0) == 100L)
    } finally spark.conf.unset("spark.graft.rowLevel.mode")
  }

  test("merge-on-read parity: same statements, same table state as copy-on-write") {
    val wh = Files.createTempDirectory("graft-logpar").toString
    spark.conf.set("spark.sql.catalog.graftpar", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftpar.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftpar.etl")
    def run(table: String, mode: String): Seq[org.apache.spark.sql.Row] = {
      spark.sql(s"CREATE TABLE graftpar.etl.$table (k BIGINT, v STRING, n BIGINT) " +
        "TBLPROPERTIES ('keyCol'='k')")
      spark.sql(s"INSERT INTO graftpar.etl.$table SELECT id, concat('v', id), 0 " +
        "FROM range(0, 500)")
      spark.conf.set("spark.graft.rowLevel.mode", mode)
      try {
        spark.sql(s"UPDATE graftpar.etl.$table SET n = 1 WHERE k % 7 = 0")
        spark.sql("SELECT id * 2 AS k, concat('s', id) AS v, " +
          "CAST(5 AS BIGINT) AS n FROM range(240, 260)")
          .createOrReplaceTempView(s"par_src_$table")
        spark.sql(s"""MERGE INTO graftpar.etl.$table AS tgt
          |USING par_src_$table AS src ON tgt.k = src.k
          |WHEN MATCHED AND src.k % 3 = 0 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = src.v, n = src.n
          |WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (src.k, src.v, src.n)
          |""".stripMargin)
        spark.sql(s"DELETE FROM graftpar.etl.$table WHERE v = 'v13'")
      } finally spark.conf.unset("spark.graft.rowLevel.mode")
      spark.sql(s"SELECT k, v, n FROM graftpar.etl.$table ORDER BY k").collect().toSeq
    }
    val cow = run("tcow", "copy-on-write")
    val mor = run("tmor", "merge-on-read")
    assert(mor == cow, "merge-on-read result diverged from copy-on-write")
  }

  test("merge-on-read budget: a bulk UPDATE fails loudly with the copy-on-write hint") {
    val wh = Files.createTempDirectory("graft-logbud").toString
    spark.conf.set("spark.sql.catalog.graftbud", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftbud.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftbud.etl")
    spark.sql("CREATE TABLE graftbud.etl.t (k BIGINT, n BIGINT) " +
      "TBLPROPERTIES ('keyCol'='k')")
    spark.sql("INSERT INTO graftbud.etl.t SELECT id, 0 FROM range(0, 400)")
    val oldCap = sys.props.get("graft.dv.maxKeys")
    sys.props("graft.dv.maxKeys") = "100"
    spark.conf.set("spark.graft.rowLevel.mode", "merge-on-read")
    try {
      val e = intercept[Exception] {
        spark.sql("UPDATE graftbud.etl.t SET n = 1 WHERE k >= 0")
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("copy-on-write")),
        s"bulk merge-on-read must point at copy-on-write, got: ${msgs(e)}")
      // nothing committed: the table still reads n = 0 everywhere
      assert(spark.sql("SELECT count(*) FROM graftbud.etl.t WHERE n <> 0")
        .head().getLong(0) == 0L)
    } finally {
      spark.conf.unset("spark.graft.rowLevel.mode")
      oldCap match {
        case Some(v) => sys.props("graft.dv.maxKeys") = v
        case None => sys.props.remove("graft.dv.maxKeys")
      }
    }
  }

  test("row-level SQL serves RENAMED tables: task parts land physical names, both modes") {
    val wh = Files.createTempDirectory("graft-logren").toString
    spark.conf.set("spark.sql.catalog.graftren", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftren.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftren.etl")
    spark.sql("CREATE TABLE graftren.etl.t (k BIGINT, v STRING, n BIGINT) " +
      "TBLPROPERTIES ('keyCol'='k')")
    for (i <- 0 until 2)
      spark.sql(s"INSERT INTO graftren.etl.t SELECT /*+ REPARTITION(1) */ " +
        s"id, concat('v', id), 0 FROM range(${i * 1000}, ${i * 1000 + 1000})")
    val t = s"$wh/etl/t"
    val preRenameV = LogTable.version(t)
    spark.sql("ALTER TABLE graftren.etl.t RENAME COLUMN v TO label")
    // copy-on-write UPDATE through the group write: the replacement
    // parts must register under the PHYSICAL name (reading them back
    // under the logical name proves it — a logical-named part would
    // serve typed NULLs)
    spark.sql("UPDATE graftren.etl.t SET label = 'upd', n = 1 " +
      "WHERE k >= 1500 AND k < 1600")
    assert(spark.sql("SELECT label FROM graftren.etl.t WHERE k = 1500")
      .head().getString(0) == "upd")
    assert(spark.sql("SELECT count(*) FROM graftren.etl.t WHERE n = 1")
      .head().getLong(0) == 100L)
    // the mapping composes: rename AGAIN, the updated rows still serve
    spark.sql("ALTER TABLE graftren.etl.t RENAME COLUMN label TO tag")
    assert(spark.sql("SELECT tag FROM graftren.etl.t WHERE k = 1599")
      .head().getString(0) == "upd")
    // merge-on-read on the renamed table: zero rewrites, vectors + a
    // physical-named appended part
    val files = LogTable.read(spark, t).inputFiles.toSet
    spark.conf.set("spark.graft.rowLevel.mode", "merge-on-read")
    try {
      spark.sql("UPDATE graftren.etl.t SET tag = 'mor' WHERE k IN (10, 1700)")
      assert(files.subsetOf(LogTable.read(spark, t).inputFiles.toSet),
        "merge-on-read on a renamed table rewrote a data file")
      assert(spark.sql("SELECT tag FROM graftren.etl.t WHERE k = 10")
        .head().getString(0) == "mor")
      assert(spark.sql("SELECT count(*) FROM graftren.etl.t")
        .head().getLong(0) == 2000L)
      // rename the KEY column too, then a delta DELETE under the new name
      spark.sql("ALTER TABLE graftren.etl.t RENAME COLUMN k TO id")
      spark.sql("DELETE FROM graftren.etl.t WHERE id IN (20, 1800) AND tag <> 'x'")
      assert(spark.sql("SELECT count(*) FROM graftren.etl.t")
        .head().getLong(0) == 1998L)
      assert(spark.sql("SELECT count(*) FROM graftren.etl.t WHERE id = 20")
        .head().getLong(0) == 0L)
    } finally spark.conf.unset("spark.graft.rowLevel.mode")
    // history: the pre-rename version reads under the ORIGINAL names
    val old = spark.sql(
      s"SELECT * FROM graftren.etl.t VERSION AS OF $preRenameV")
    assert(old.schema.fieldNames.toSeq == Seq("k", "v", "n"))
    assert(old.filter("k = 1500").head().getString(1) == "v1500")
  }

  test("TBLPROPERTIES persist: CREATE + SET/UNSET, per-table merge-on-read policy, truncation-proof") {
    val wh = Files.createTempDirectory("graft-logprops").toString
    spark.conf.set("spark.sql.catalog.graftprops", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftprops.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftprops.etl")
    spark.sql("CREATE TABLE graftprops.etl.t (k BIGINT, v STRING, n BIGINT) " +
      "TBLPROPERTIES ('keyCol'='k', 'rowLevel'='merge-on-read', 'team'='data-eng')")
    for (i <- 0 until 2)
      spark.sql(s"INSERT INTO graftprops.etl.t SELECT /*+ REPARTITION(1) */ " +
        s"id, concat('v', id), 0 FROM range(${i * 1000}, ${i * 1000 + 1000})")
    val t = s"$wh/etl/t"
    def shown(): Map[String, String] =
      spark.sql("SHOW TBLPROPERTIES graftprops.etl.t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    // stored properties surface beside the computed ones
    val p0 = shown()
    assert(p0.get("rowLevel").contains("merge-on-read"), p0.toString)
    assert(p0.get("team").contains("data-eng"))
    assert(p0.get("keyCol").contains("k") && p0.get("format").contains("graft-log"))
    // the PER-TABLE policy alone (no session conf) plans the delta
    // write: zero files rewritten, vectors committed
    val files0 = LogTable.read(spark, t).inputFiles.toSet
    spark.sql("UPDATE graftprops.etl.t SET n = 1 WHERE k >= 100 AND k < 140")
    assert(files0.subsetOf(LogTable.read(spark, t).inputFiles.toSet),
      "the stored rowLevel=merge-on-read policy did not take effect")
    assert(graft.io.LogTable.liveDvs(t, None).nonEmpty)
    assert(spark.sql("SELECT count(*) FROM graftprops.etl.t WHERE n = 1")
      .head().getLong(0) == 40L)
    // the SESSION conf overrides the table policy (operator escape hatch)
    spark.conf.set("spark.graft.rowLevel.mode", "copy-on-write")
    try {
      val before = LogTable.read(spark, t).inputFiles.toSet
      spark.sql("UPDATE graftprops.etl.t SET n = 2 WHERE k >= 1100 AND k < 1140")
      assert((before -- LogTable.read(spark, t).inputFiles.toSet).size == 1,
        "the session override must force the copy-on-write rewrite")
    } finally spark.conf.unset("spark.graft.rowLevel.mode")
    // ALTER ... UNSET removes the policy: back to the copy-on-write default
    spark.sql("ALTER TABLE graftprops.etl.t UNSET TBLPROPERTIES ('rowLevel')")
    assert(!shown().contains("rowLevel"))
    val before2 = LogTable.read(spark, t).inputFiles.toSet
    spark.sql("UPDATE graftprops.etl.t SET n = 3 WHERE k >= 200 AND k < 240")
    assert((before2 -- LogTable.read(spark, t).inputFiles.toSet).nonEmpty,
      "without the policy the default must rewrite (copy-on-write)")
    // SET updates; the fold survives history truncation (the checkpoint
    // carries the property fold like it carries txns and vectors)
    spark.sql("ALTER TABLE graftprops.etl.t SET TBLPROPERTIES ('team'='ml')")
    spark.sql("CALL graftprops.system.truncate_history('etl.t', 2, 0)")
    val pAfter = shown()
    assert(pAfter.get("team").contains("ml"),
      s"history truncation forgot a table property: $pAfter")
    assert(!pAfter.contains("rowLevel"), "truncation resurrected an unset key")
    // computed names refuse storage
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE graftprops.etl.t SET TBLPROPERTIES ('keyCol'='v')"))
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(x => Option(x.getMessage).exists(_.contains("computed"))), e.toString)
    // a clone carries the property fold (a policy must not silently
    // revert in the copy)
    val dst = Files.createTempDirectory("graft-logprops-cl").resolve("c").toString
    graft.io.LogTable.cloneTable(t, dst)
    assert(graft.io.LogTable.tableProps(dst).get("team").contains("ml"))
  }

  test("keyed registration rejects NULL keys (the identifier-field rule)") {
    val t = tmpTable()
    // one part holding a valid AND a null key: stats exist, the null
    // count carries the refusal (a pure-null part refuses earlier on
    // missing key stats — also correct, but this pins the new check)
    val df = Seq((Some(1L), "a"), (None, "b")).toDF("k", "v").coalesce(1)
    val e = intercept[Exception] { LogTable.create(spark, t, df, "k") }
    assert(e.getMessage != null && e.getMessage.contains("NULL key"),
      s"expected the NULL-key refusal, got: ${e.getMessage}")
  }

  test("ALTER COLUMN TYPE widening: metadata-only, time travel keeps the old type, pruning exact, constraints re-proven") {
    val wh = Files.createTempDirectory("graft-widen").toString
    spark.conf.set("spark.sql.catalog.graftwid", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftwid.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftwid.etl")
    // INT key + INT measure + FLOAT score: the three widenable families
    spark.sql("CREATE TABLE graftwid.etl.t (k INT, n INT, score FLOAT, v STRING) " +
      "TBLPROPERTIES ('keyCol'='k', 'constraint.n_range'='n BETWEEN 0 AND 2000000')")
    val t = s"$wh/etl/t"
    // range-disjoint int32 files, so the post-widen pruning assertion is
    // deterministic (hash DISTRIBUTE BY would mix key ranges per file)
    spark.range(0, 8000).select(
        col("id").cast("int").as("k"),
        (col("id") % 1000).cast("int").as("n"),
        (col("id") / 10.0).cast("float").as("score"),
        concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(8, col("k"))
      .write.format("graft-log").mode("append").save(t)
    val preWidenV = LogTable.version(t)
    val filesBefore = LogTable.read(spark, t).inputFiles.toSet
    assert(filesBefore.size >= 8, s"want >=8 files, got ${filesBefore.size}")

    // the widen: ONE metadata-only commit per column, ZERO files touched
    spark.sql("ALTER TABLE graftwid.etl.t ALTER COLUMN n TYPE BIGINT")
    spark.sql("ALTER TABLE graftwid.etl.t ALTER COLUMN score TYPE DOUBLE")
    spark.sql("ALTER TABLE graftwid.etl.t ALTER COLUMN k TYPE BIGINT") // key widens too
    assert(LogTable.version(t) == preWidenV + 3,
      "each widen must land as ONE metadata-only commit")
    assert(LogTable.read(spark, t).inputFiles.toSet == filesBefore,
      "widening rewrote data files — must be metadata-only")

    // the head serves the WIDE types through BOTH read paths, values exact
    import org.apache.spark.sql.types.{LongType, DoubleType, IntegerType, FloatType}
    val conn = load(t)
    assert(conn.schema("k").dataType == LongType)
    assert(conn.schema("n").dataType == LongType)
    assert(conn.schema("score").dataType == DoubleType)
    val viaApi = LogTable.read(spark, t)
    assert(viaApi.schema("n").dataType == LongType &&
      viaApi.schema("score").dataType == DoubleType)
    val r42c = conn.filter(col("k") === 42L).head()
    assert(r42c.getAs[Long]("n") == 42L &&
      r42c.getAs[Double]("score") == 4.2f.toDouble &&
      r42c.getAs[String]("v") == "v42")
    assert(viaApi.filter(col("k") === 42L).head().getAs[Long]("n") == 42L)
    assert(conn.count() == 8000L && viaApi.count() == 8000L)

    // post-widen rows may exceed the old type's range
    spark.sql("INSERT INTO graftwid.etl.t SELECT 9999999999, 1999999, 1.5, 'big'")
    assert(spark.sql(
      "SELECT n FROM graftwid.etl.t WHERE k = 9999999999").head().getLong(0) == 1999999L)

    // manifest-stats pruning stays EXACT across the widen: a key window
    // over pre-widen (int32) files prunes from the same long bounds
    val got = load(t).filter(col("k") >= 3400L && col("k") <= 3490L)
      .orderBy("k").collect().map(_.getAs[Long]("k")).toSeq
    assert(got == (3400L to 3490L).toSeq)
    assert(LogTableScan.lastPlannedFiles.get() == 1,
      s"post-widen key window planned ${LogTableScan.lastPlannedFiles.get()} " +
        s"of ${LogTableScan.lastTotalFiles.get()} files — pruning broke")

    // stats-only aggregate pushdown answers under the WIDE type
    val agg = spark.sql(
      "SELECT count(*), min(n), max(n) FROM graftwid.etl.t").head()
    assert(agg.getLong(0) == 8001L && agg.getLong(1) == 0L &&
      agg.getLong(2) == 1999999L)
    assert(LogTableScan.lastPlannedFiles.get() == 0,
      "unfiltered agg over a widened column must answer from the manifest")

    // TIME TRAVEL below the widen keeps the OLD types over the old files
    val old = spark.sql(
      s"SELECT * FROM graftwid.etl.t VERSION AS OF $preWidenV")
    assert(old.schema("k").dataType == IntegerType &&
      old.schema("n").dataType == IntegerType &&
      old.schema("score").dataType == FloatType,
      s"time travel must serve the pre-widen types, got ${old.schema}")
    assert(old.filter(col("k") === 42).head().getAs[Int]("n") == 42)
    assert(old.count() == 8000L)

    // CONSTRAINTS are RE-PROVEN, not orphaned: the widened column's
    // range CHECK still refuses a violating post-widen batch
    val e = intercept[Exception](
      spark.sql("INSERT INTO graftwid.etl.t SELECT 777777, 3000000, 0.0, 'x'"))
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("constraint"), s"widened CHECK stopped enforcing: $msgs")
    assert(spark.sql("SELECT count(*) FROM graftwid.etl.t").head().getLong(0) == 8001L)

    // keyed writes keep working across the mixed-width file set
    LogTable.upsert(spark, t,
      Seq((42L, 42L, 0.42d, "upserted")).toDF("k", "n", "score", "v"), "k")
    assert(load(t).filter(col("k") === 42L).head().getAs[String]("v") == "upserted")

    // refusals: narrowing, cross-family, decimal scale change, unknown col
    def refusedWiden(name: String, dt: org.apache.spark.sql.types.DataType): Unit = {
      val ex = intercept[Exception](LogTable.widenColumn(spark, t, name, dt))
      assert(ex.getMessage.contains("widening") || ex.getMessage.contains("no column"),
        ex.getMessage)
    }
    refusedWiden("n", IntegerType) // narrowing back
    refusedWiden("v", LongType) // cross-family
    refusedWiden("nope", LongType) // unknown column
    // re-widening to the current type: idempotent no-op, no commit
    val vNow = LogTable.version(t)
    LogTable.widenColumn(spark, t, "n", LongType)
    assert(LogTable.version(t) == vNow, "same-type widen must not commit")

    // decimal precision widening (API level: value-preserving at fixed
    // scale; scale changes refuse)
    val t2 = tmpTable()
    LogTable.create(spark, t2,
      spark.sql("SELECT id AS k, CAST(id / 100.0 AS DECIMAL(7,2)) AS amt " +
        "FROM range(1, 101)"), "k")
    LogTable.widenColumn(spark, t2, "amt",
      org.apache.spark.sql.types.DecimalType(18, 2))
    val wide2 = LogTable.read(spark, t2)
    assert(wide2.schema("amt").dataType ==
      org.apache.spark.sql.types.DecimalType(18, 2))
    assert(wide2.filter(col("k") === 50L).head()
      .getAs[java.math.BigDecimal]("amt").compareTo(
        new java.math.BigDecimal("0.50")) == 0)
    intercept[Exception](LogTable.widenColumn(spark, t2, "amt",
      org.apache.spark.sql.types.DecimalType(20, 4))) // scale change forks values
  }

  test("write-time constraints: NOT NULL and range CHECKs enforce from footer stats") {
    val wh = Files.createTempDirectory("graft-constr").toString
    spark.conf.set("spark.sql.catalog.graftcn", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcn.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftcn.etl")
    // constraints ride CREATE TABLE TBLPROPERTIES (the ADD CONSTRAINT
    // surface for a DSv2 catalog) and round-trip the property fold
    spark.sql("CREATE TABLE graftcn.etl.t (k BIGINT, v STRING, n BIGINT) " +
      "TBLPROPERTIES ('keyCol'='k', " +
      "'constraint.n_present'='n IS NOT NULL', " +
      "'constraint.n_range'='n BETWEEN 0 AND 100')")
    val t = s"$wh/etl/t"
    spark.sql("INSERT INTO graftcn.etl.t SELECT id, concat('v', id), id % 100 " +
      "FROM range(0, 1000)")
    assert(spark.sql("SELECT count(*) FROM graftcn.etl.t").head().getLong(0) == 1000L)
    val shown = spark.sql("SHOW TBLPROPERTIES graftcn.etl.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("constraint.n_present").contains("n IS NOT NULL"), shown.toString)
    assert(shown.get("constraint.n_range").contains("n BETWEEN 0 AND 100"))
    // a violating append refuses LOUDLY and commits nothing
    def refuses(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("constraint") && msgs.contains(needle),
        s"expected a loud constraint refusal mentioning '$needle', got: $msgs")
      assert(spark.sql("SELECT count(*) FROM graftcn.etl.t")
        .head().getLong(0) == 1000L, "a refused write half-landed")
    }
    refuses("INSERT INTO graftcn.etl.t SELECT 5000, 'x', NULL", "NULL")
    refuses("INSERT INTO graftcn.etl.t SELECT 5001, 'x', 200", "200")
    refuses("INSERT INTO graftcn.etl.t SELECT 5002, 'x', -1", "-1")
    // adding a constraint the CURRENT data violates refuses (stats-only)
    val bad = intercept[Exception](LogTable.setProperties(t,
      Map("constraint.n_low" -> "n <= 50")))
    assert(bad.getMessage.contains("violates"), bad.getMessage)
    // the grammar gate is loud, at SET time and at CREATE time
    val ugly = intercept[Exception](LogTable.setProperties(t,
      Map("constraint.bogus" -> "n LIKE 'x%'")))
    assert(ugly.getMessage.contains("grammar"), ugly.getMessage)
    // rename/drop of a constrained column refuses until the UNSET
    val ren = intercept[Exception](LogTable.renameColumn(spark, t, "n", "m"))
    assert(ren.getMessage.contains("constraint"), ren.getMessage)
    val drp = intercept[Exception](LogTable.dropColumns(spark, t, Seq("n")))
    assert(drp.getMessage.contains("constraint"), drp.getMessage)
    // UNSET lifts enforcement: the same violating row now lands
    spark.sql("ALTER TABLE graftcn.etl.t UNSET TBLPROPERTIES " +
      "('constraint.n_present', 'constraint.n_range')")
    spark.sql("INSERT INTO graftcn.etl.t SELECT 5000, 'x', NULL")
    assert(spark.sql("SELECT count(*) FROM graftcn.etl.t").head().getLong(0) == 1001L)
  }

  test("write-time constraints, string/double rung: quoted and decimal CHECKs enforce from footer stats") {
    val wh = Files.createTempDirectory("graft-constr2").toString
    spark.conf.set("spark.sql.catalog.graftcs", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcs.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftcs.etl")
    // the orders status domain as a STRING-range CHECK (BETWEEN is the
    // footer-provable spelling of IN ('F','O','P') — its convex hull),
    // plus a DOUBLE CHECK with a decimal-point literal
    spark.sql("CREATE TABLE graftcs.etl.t (k BIGINT, status STRING, price DOUBLE) " +
      "TBLPROPERTIES ('keyCol'='k', " +
      "'constraint.status_dom'='status BETWEEN ''F'' AND ''P''', " +
      "'constraint.price_pos'='price >= 0.0')")
    val t = s"$wh/etl/t"
    spark.sql("INSERT INTO graftcs.etl.t SELECT id, " +
      "CASE id % 3 WHEN 0 THEN 'F' WHEN 1 THEN 'O' ELSE 'P' END, " +
      "CAST(id AS DOUBLE) / 10 FROM range(0, 300)")
    def total(): Long =
      spark.sql("SELECT count(*) FROM graftcs.etl.t").head().getLong(0)
    assert(total() == 300L)
    def refuses(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString("\n")
      assert(msgs.contains("constraint") && msgs.contains(needle),
        s"expected a loud constraint refusal mentioning '$needle', got: $msgs")
    }
    // append-time: out-of-domain strings refuse on both sides of the range
    refuses("INSERT INTO graftcs.etl.t SELECT 1000, 'Z', 1.0", "Z")
    refuses("INSERT INTO graftcs.etl.t SELECT 1001, 'A', 1.0", "A")
    // append-time: negative and NaN doubles refuse (NaN drops the file's
    // colsD stats, so the CHECK cannot prove — the stats-layer NaN rule)
    refuses("INSERT INTO graftcs.etl.t SELECT 1002, 'O', -1.5", "-1.5")
    refuses("INSERT INTO graftcs.etl.t SELECT 1003, 'O', CAST('NaN' AS DOUBLE)",
      "cannot prove")
    // NULLs pass a CHECK per SQL semantics — an all-null file complies
    spark.sql("INSERT INTO graftcs.etl.t SELECT 1004, NULL, NULL")
    assert(total() == 301L)
    // SET-time: a stricter string CHECK the current data violates
    // refuses; once the violating rows are deleted it lands, and then
    // enforces at append time
    val bad = intercept[Exception](LogTable.setProperties(t,
      Map("constraint.status_cap" -> "status <= 'O'")))
    assert(bad.getMessage.contains("violates"), bad.getMessage)
    spark.sql("DELETE FROM graftcs.etl.t WHERE status = 'P'")
    LogTable.setProperties(t, Map("constraint.status_cap" -> "status <= 'O'"))
    refuses("INSERT INTO graftcs.etl.t SELECT 2000, 'P', 1.0", "P")
    spark.sql("INSERT INTO graftcs.etl.t SELECT 2001, 'F', 1.0")
    // type routing is loud: a quoted literal on a DOUBLE column and a
    // decimal literal on a BIGINT column both refuse at SET time
    val sOnD = intercept[Exception](LogTable.setProperties(t,
      Map("constraint.wrong1" -> "price <= 'x'")))
    assert(sOnD.getMessage.contains("STRING column"), sOnD.getMessage)
    val dOnL = intercept[Exception](LogTable.setProperties(t,
      Map("constraint.wrong2" -> "k >= 0.5")))
    assert(dOnL.getMessage.contains("DOUBLE/FLOAT column"), dOnL.getMessage)
    // IN is outside the footer-decidable family: refused loudly (its
    // commas trip the manifest-safety gate before the grammar gate —
    // either way it can never land)
    val inRef = intercept[Exception](LogTable.setProperties(t,
      Map("constraint.status_in" -> "status IN ('F','O','P')")))
    assert(inRef.getMessage.contains("grammar") ||
      inRef.getMessage.contains("plain tokens"), inRef.getMessage)
    // ... and the comma-free spelling hits the grammar gate proper
    val inRef2 = intercept[Exception](LogTable.setProperties(t,
      Map("constraint.status_in" -> "status IN ('F')")))
    assert(inRef2.getMessage.contains("grammar"), inRef2.getMessage)
  }

  test("bulk SQL DELETE under merge-on-read commits positional bitmaps: zero rewrites, exact feed") {
    val wh = Files.createTempDirectory("graft-dvbulk").toString
    spark.conf.set("spark.sql.catalog.graftdvb", classOf[LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftdvb.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftdvb.etl")
    spark.sql("CREATE TABLE graftdvb.etl.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('keyCol'='k', 'rowLevel'='merge-on-read')")
    // 30k rows over a tiny key-set budget: the bulk path MUST engage
    sys.props("graft.dv.maxKeys") = "100"
    try {
      for (i <- 0 until 3)
        spark.sql(s"INSERT INTO graftdvb.etl.t SELECT /*+ REPARTITION(1) */ " +
          s"id, concat('v', id) FROM range(${i * 10000}, ${i * 10000 + 10000})")
      val t = s"$wh/etl/t"
      val filesBefore = LogTable.read(spark, t).inputFiles.toSet
      val vBefore = LogTable.version(t)
      // >20k matching keys — far over graft.dv.maxKeys, metadata-
      // translatable predicate: one position scan, one bitmap commit
      spark.sql("DELETE FROM graftdvb.etl.t WHERE k >= 5000 AND k < 27000")
      assert(LogTable.version(t) == vBefore + 1, "expected ONE commit")
      assert(LogTable.read(spark, t).inputFiles.toSet == filesBefore,
        "bulk merge-on-read DELETE rewrote data files")
      assert(LogTable.liveDvs(t, None).isEmpty,
        "bulk path minted inline key vectors (budget bypass)")
      assert(LogTable.livePosDvs(t, None).nonEmpty, "no positional vectors committed")
      // both read paths serve the delete
      assert(spark.sql("SELECT count(*) FROM graftdvb.etl.t").head().getLong(0) == 8000L)
      assert(LogTable.read(spark, t).count() == 8000L)
      assert(spark.sql(
        "SELECT count(*) FROM graftdvb.etl.t WHERE k BETWEEN 5000 AND 26999")
        .head().getLong(0) == 0L)
      // the change feed serves the bulk delete exactly: 22000 delete
      // images for the vectored commit, nothing else
      val feed = spark.read.format("graft-log")
        .option("readChangeFeed", "true")
        .option("startingVersion", vBefore.toString)
        .load(t)
      val byType = feed.groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType == Map("delete" -> 22000L), byType.toString)
      assert(feed.filter(col("_change_type") === "delete")
        .agg(min("k"), max("k")).head() match {
          case r => r.getLong(0) == 5000L && r.getLong(1) == 26999L
        })
      // a second bulk delete ACCUMULATES; its feed window is net-new only
      val v2 = LogTable.version(t)
      spark.sql("DELETE FROM graftdvb.etl.t WHERE k < 6000")
      assert(spark.sql("SELECT count(*) FROM graftdvb.etl.t").head().getLong(0) == 3000L)
      val feed2 = spark.read.format("graft-log")
        .option("readChangeFeed", "true")
        .option("startingVersion", v2.toString)
        .load(t)
      assert(feed2.count() == 5000L,
        "second window re-emitted already-dead rows (net-new violated)")
      // the bulk commits surface in CALL system.snapshots' dv_pos_files
      // (the positional compact()-pressure signal beside dv_keys)
      val posCommits = spark.sql("CALL graftdvb.system.snapshots('etl.t')")
        .filter(col("dv_pos_files") > 0).collect()
      assert(posCommits.length == 2,
        s"expected the two bulk-delete commits in snapshots: ${posCommits.toSeq}")
      // compact purges the vectors; results stand
      LogTable.compact(spark, t, "k", targetRows = 1000000L)
      assert(LogTable.livePosDvs(t, None).isEmpty)
      assert(spark.sql("SELECT count(*) FROM graftdvb.etl.t").head().getLong(0) == 3000L)
    } finally sys.props.remove("graft.dv.maxKeys")
  }

  test("a pinned scan folds deletion vectors at the pinned version, not a fresh head read") {
    // the row-level op's seam: the op pins (version, file set) at
    // statement start; a racer committing a vector between the pin and
    // scan planning must NOT skew the scan — the DV fold happens at
    // exactly the pinned version (commit-side guards already make the
    // COMMIT loud; this pins the READ side too)
    val t = tmpTable()
    LogTable.create(spark, t,
      (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), "k")
    val (v1, snap, sc) = LogTable.snapshotWithSchema(t, None)
    // racer lands a vector AFTER the pin
    LogTable.deleteKeysDV(spark, t, "k", Seq(5L))
    val sb = new LogTableScanBuilder(t, sc.get, None,
      pinnedSnapshot = Some(snap), pinnedVersion = Some(v1))
    val stats = sb.build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong == 100L,
      "the pinned scan folded the racer's post-pin vector into its row count")
    // an unpinned scan at head sees the vector
    val sbHead = new LogTableScanBuilder(t, sc.get, None)
    val headStats = sbHead.build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(headStats.numRows().getAsLong == 99L)
  }
}
