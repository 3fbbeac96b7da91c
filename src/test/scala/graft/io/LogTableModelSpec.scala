package graft.io

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Model-based random-walk check of the WHOLE log-table verb set: a
  * seeded sequence of create/append/upsert/deleteRange/overwriteAll/
  * restore/compact/truncateHistory/vacuum/ADD+DROP COLUMN ops runs
  * against both the real table and a trivial in-memory model
  * (`Map[Long, String]`), asserting after EVERY op that
  *
  *   1. the table reads exactly the model (the fundamental contract —
  *      storage machinery is semantics-free),
  *   2. every still-readable recorded version time-travels to the model
  *      state recorded when it committed (the log position IS history),
  *   3. the change feed reconstructs the head from ANY surviving base
  *      version (snapshot(v) + retraction feed (v, head] == head), and
  *   4. a clone taken at the end equals the head and is independent.
  *
  * The walk is deterministic (fixed seed) so a failure replays exactly;
  * the op mix deliberately interleaves maintenance (compact, vacuum,
  * history truncation) between mutations because the bugs these specs
  * exist to catch live in the INTERACTIONS (a truncation forgetting a
  * watermark, a compaction racing a restore, a feed crossing a
  * checkpoint), not in any verb alone. */
class LogTableModelSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft-logmodel").resolve("t").toString

  private def readKV(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select("k", "v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("random op walk: table == model, time travel == recorded history, feed reconstructs head") {
    val rnd = new Random(20260814L)
    val t = tmpTable()
    var model: Map[Long, String] = (1L to 40L).map(i => i -> s"init$i").toMap
    LogTable.create(spark, t, model.toSeq.toDF("k", "v"), "k")
    // recorded history: version -> model at that version (pruned as
    // truncation drops readability)
    var history = Map(LogTable.version(t) -> model)
    var nextFresh = 1000L // disjoint key space for append-only batches
    var extraCols = 0

    def record(): Unit = { history += LogTable.version(t) -> model }

    def checkAll(step: Int, op: String): Unit = {
      // 1. head == model
      val got = readKV(LogTable.read(spark, t))
      assert(got == model, s"step $step ($op): head diverged from model\n" +
        s"extra=${(got.toSet -- model.toSet).take(5)} missing=${(model.toSet -- got.toSet).take(5)}")
      // 2. surviving recorded versions time-travel to their recorded state
      val earliest = LogTable.history(t).head.version
      history = history.filter { case (v, _) => v >= earliest }
      val (probeV, probeModel) =
        history.toSeq(rnd.nextInt(history.size))
      assert(readKV(LogTable.readVersion(spark, t, probeV)) == probeModel,
        s"step $step ($op): VERSION AS OF $probeV diverged from recorded history")
      // 3. change-feed reconstruction from a random surviving base
      val baseV = history.keys.toSeq(rnd.nextInt(history.size))
      val base = scala.collection.mutable.Map[(Long, String), Int]()
      readKV(LogTable.readVersion(spark, t, baseV)).foreach { kv =>
        base(kv) = base.getOrElse(kv, 0) + 1
      }
      spark.read.format("graft-log")
        .option("readChangeFeed", "true").option("startingVersion", baseV.toString)
        .load(t).select("k", "v", "_change_type").collect().foreach { r =>
        val kv = (r.getLong(0), r.getString(1))
        val d = if (r.getString(2) == "insert") 1 else -1
        base(kv) = base.getOrElse(kv, 0) + d
      }
      val reconstructed = base.filter(_._2 != 0)
      assert(reconstructed.forall(_._2 == 1),
        s"step $step ($op): feed apply left non-unit multiplicities " +
          s"${reconstructed.filter(_._2 != 1).take(5)}")
      assert(reconstructed.keySet == model.toSet.map(identity[(Long, String)]),
        s"step $step ($op): feed from v$baseV failed to reconstruct the head")
    }

    // DV sources must arrive with the table's full column set (the
    // merge-on-read verbs refuse narrower batches): align a (k, v)
    // batch with typed NULLs for any live scratch columns
    def aligned(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      LogTable.read(spark, t).schema.fields
        .filterNot(f => f.name == "k" || f.name == "v")
        .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))

    for (step <- 1 to 30) {
      val op = rnd.nextInt(100) match {
        case r if r < 20 => // keyed upsert over a random window
          val lo = 1L + rnd.nextInt(60)
          val batch = (lo until lo + 1 + rnd.nextInt(12))
            .map(k => k -> s"u$step-$k")
          LogTable.upsert(spark, t, batch.toDF("k", "v"), "k")
          model = model ++ batch
          "upsert"
        case r if r < 33 => // append of FRESH keys (model stays a map)
          val batch = (nextFresh until nextFresh + 1 + rnd.nextInt(8))
            .map(k => k -> s"a$step-$k")
          nextFresh += 20
          LogTable.append(spark, t, batch.toDF("k", "v"), "k")
          model = model ++ batch
          "append"
        case r if r < 45 => // range delete
          val lo = 1L + rnd.nextInt(50)
          val hi = lo + rnd.nextInt(15)
          LogTable.deleteRange(spark, t, "k", lo, hi)
          model = model.filter { case (k, _) => k < lo || k > hi }
          "deleteRange"
        case r if r < 52 => // replace-all
          val batch = (1L to 10L + rnd.nextInt(20))
            .map(k => k -> s"o$step-$k")
          LogTable.overwriteAll(spark, t, batch.toDF("k", "v"), "k")
          model = batch.toMap
          "overwriteAll"
        case r if r < 59 => // restore to a surviving recorded version
          val v = history.keys.toSeq(rnd.nextInt(history.size))
          LogTable.restore(t, v)
          model = history(v)
          "restore"
        case r if r < 66 => // compact (semantic no-op; purges vectors)
          LogTable.compact(spark, t, "k", targetRows = 200L)
          "compact"
        case r if r < 73 => // history truncation (+ its vacuum)
          LogTable.truncateHistory(t, keepLast = 2 + rnd.nextInt(3))
          "truncateHistory"
        case r if r < 78 => // vacuum (no-op on semantics)
          LogTable.vacuum(t)
          "vacuum"
        case r if r < 85 => // MERGE-ON-READ upsert: vectors + appended
          // images, zero rewrites — same model delta as upsert
          val lo = 1L + rnd.nextInt(60)
          val batch = (lo until lo + 1 + rnd.nextInt(10))
            .map(k => k -> s"dv$step-$k")
          LogTable.upsertDV(spark, t, aligned(batch.toDF("k", "v")), "k")
          model = model ++ batch
          "upsertDV"
        case r if r < 90 => // MERGE-ON-READ key delete: pure metadata
          val ks = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(6))
          LogTable.deleteKeysDV(spark, t, "k", ks)
          model = model -- ks
          "deleteKeysDV"
        case r if r < 93 => // CONDITIONAL merge-on-read: matched rows
          // delete when k % 5 == 0, update otherwise; unmatched insert
          val lo = 1L + rnd.nextInt(60)
          val batch = (lo until lo + 1 + rnd.nextInt(10))
            .map(k => k -> s"m$step-$k")
          LogTable.mergeDV(spark, t, aligned(batch.toDF("k", "v")), "k",
            updateWhen = Some("true"), deleteWhen = Some("_src_k % 5 = 0"),
            insertUnmatched = true)
          model = batch.foldLeft(model) { case (m, (k, v)) =>
            if (m.contains(k)) { if (k % 5 == 0) m - k else m.updated(k, v) }
            else m.updated(k, v)
          }
          "mergeDV"
        case r if r < 97 => // BULK POSITIONAL delete: predicate rows die
          // via roaring-bitmap sidecars, zero rewrites — interleaved
          // with compact (purge), restore (resurrection), truncation
          // (checkpoint fold) and the key-vector verbs, which is where
          // positional/key/rewrite interaction bugs would live
          val lo = 1L + rnd.nextInt(50)
          val hi = lo + rnd.nextInt(20)
          LogTable.deleteWherePositional(spark, t, _ => true,
            col("k") >= lo && col("k") <= hi && length(col("v")) % 2 === 0)
          model = model.filterNot { case (k, v) =>
            k >= lo && k <= hi && v.length % 2 == 0 }
          "deleteWherePositional"
        case _ => // schema evolution round-trip: add a scratch column,
          // sometimes drop the previous one (reads check (k, v) only)
          extraCols += 1
          LogTable.addColumns(spark, t, Seq(
            org.apache.spark.sql.types.StructField(s"scratch$extraCols",
              org.apache.spark.sql.types.LongType)))
          if (extraCols > 1)
            LogTable.dropColumns(spark, t, Seq(s"scratch${extraCols - 1}"),
              ifExists = true)
          "addDropColumn"
      }
      record()
      checkAll(step, op)
    }

    // 4. end-of-walk clone: equal, independent
    val dst = tmpTable()
    LogTable.cloneTable(t, dst)
    assert(readKV(LogTable.read(spark, dst)) == model)
    LogTable.upsert(spark, dst, Seq((999999L, "cloneonly")).toDF("k", "v"), "k")
    assert(readKV(LogTable.read(spark, t)) == model,
      "a clone write leaked into the source at the end of the walk")
  }
}
