package graft.streaming

import graft.SparkTestSession
import graft.io.LogTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Incremental view maintenance over the change data feed — the
  * retraction changelog's canonical consumer: a per-bucket SUM is kept
  * current by applying signed deltas (insert → +amount, delete →
  * −amount) from `readChangeFeed` micro-batches, never rescanning the
  * source. This is exactly why the feed serves whole-file retraction
  * images rather than failing on change commits: an upsert's unchanged
  * rows arrive as delete+insert pairs whose deltas cancel, so the
  * maintained aggregate stays exact under ANY mix of upserts, deletes,
  * and appends — proven here by comparing against a from-scratch
  * recompute after each wave, across a checkpoint restart.
  *
  * The per-batch apply touches only the buckets the batch mentions
  * (delta groupBy + keyed upsert of those buckets), which is the shape
  * that scales: maintenance cost tracks the CHANGE volume, not the
  * source size. (A production pipeline would make the apply itself a
  * fenced transactional epoch — LogTable.upsertEpoch — so a crashed
  * foreachBatch replay can't double-apply; this spec drives clean runs
  * and pins the arithmetic.) */
class IncrementalViewSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-ivm-$name").resolve("t").toString

  test("per-bucket SUM maintained from the change feed equals a from-scratch recompute") {
    val src = tmp("src")
    val agg = tmp("agg")
    val ckpt = Files.createTempDirectory("graft-ivm-ckpt").toString
    // source: (k, bucket, amount), strictly positive amounts so an
    // empty bucket is the ONLY way to a zero total
    def rows(ks: Seq[Long], tag: Int): DataFrame =
      ks.map(k => (k, k % 5, k + 100L * tag)).toDF("k", "bucket", "amount")
    LogTable.create(spark, src, rows(1L to 60L, 0), "k")
    LogTable.createEmpty(agg,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("total",
          org.apache.spark.sql.types.LongType))), "bucket")

    def startQuery() = spark.readStream.format("graft-log")
      .option("readChangeFeed", "true").load(src)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val deltas = batch.groupBy("bucket").agg(
          sum(when(col("_change_type") === "insert", col("amount"))
            .otherwise(-col("amount"))).as("delta"))
        val changed = deltas
          .join(LogTable.read(spark, agg), Seq("bucket"), "left")
          .select(col("bucket"),
            (coalesce(col("total"), lit(0L)) + col("delta")).as("total"))
        LogTable.upsert(spark, agg, changed, "bucket")
        ()
      }.start()

    def recompute(): Map[Long, Long] =
      LogTable.read(spark, src).groupBy("bucket")
        .agg(sum("amount").as("total")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def maintained(): Map[Long, Long] =
      LogTable.read(spark, agg).filter(col("total") =!= 0L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val q = startQuery()
    try {
      q.processAllAvailable()
      assert(maintained() == recompute(), "initial load diverged")
      // wave 1: an upsert rewrites files — unchanged rows' delete+insert
      // pairs must cancel; changed rows contribute exact deltas
      LogTable.upsert(spark, src, rows(10L to 20L, 7), "k")
      // wave 2: a range delete retracts whole rows
      LogTable.deleteRange(spark, src, "k", 30L, 45L)
      q.processAllAvailable()
      assert(maintained() == recompute(),
        "maintained aggregate diverged after upsert + deleteRange")
    } finally q.stop()
    // restart from the checkpoint: only NEW changes apply, nothing
    // double-counts
    LogTable.append(spark, src, rows(200L to 210L, 3), "k")
    LogTable.upsert(spark, src, rows(1L to 5L, 9), "k")
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(maintained() == recompute(),
        "maintained aggregate diverged across a checkpoint restart")
    } finally q2.stop()
  }
}
