package graft.io

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The log-structured table's four contracts: snapshot correctness
  * (upsert == the anti-join semantics Load.upsert defines), file-level
  * pruning from manifest key stats, optimistic concurrency without lost
  * updates, and crash invisibility of unreferenced data files — plus
  * time travel as a fold property. */
class LogTableSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-logtable").resolve("t").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("create/read round-trip and upsert equals the keyed anti-join semantics") {
    val t = tmpTable()
    val base = (1L to 1000L).map(i => (i, s"base$i")).toDF("k", "v")
    LogTable.create(spark, t, base, "k")
    assert(rows(LogTable.read(spark, t)) == rows(base))

    val incoming = (900L to 1100L).map(i => (i, s"new$i")).toDF("k", "v")
    LogTable.upsert(spark, t, incoming, "k")
    val expected = graft.etl.Load.upsert(base, incoming, Seq("k"))
    assert(rows(LogTable.read(spark, t)) == rows(expected),
      "log-table upsert diverged from the reference delete-then-insert semantics")
  }

  test("manifest key stats prune untouched files: a narrow upsert rewrites only overlapping ranges") {
    val t = tmpTable()
    // range-partitioned create → files with disjoint key ranges
    val base = (1L to 10000L).map(i => (i, s"base$i")).toDF("k", "v")
      .repartitionByRange(8, col("k"))
    LogTable.create(spark, t, base, "k")
    val before = LogTable.read(spark, t).inputFiles.toSet
    assert(before.size >= 8)

    LogTable.upsert(spark, t, Seq((5L, "touched")).toDF("k", "v"), "k")
    val after = LogTable.read(spark, t).inputFiles.toSet
    // exactly one range file intersects k=5: every other file survives
    // IDENTICALLY (same path — never rewritten, never copied)
    assert((before -- after).size == 1,
      s"upsert of one key rewrote ${(before -- after).size} files")
    assert((after -- before).nonEmpty)
    val r = LogTable.read(spark, t)
    assert(r.filter(col("k") === 5L).select("v").head().getString(0) == "touched")
    assert(r.count() == 10000L)
  }

  test("concurrent upserts: no lost update, both commits land (optimistic log)") {
    val t = tmpTable()
    LogTable.create(spark, t,
      (1L to 2000L).map(i => (i, s"base$i")).toDF("k", "v")
        .repartitionByRange(4, col("k")), "k")
    val lowKeys = (1L to 200L).map(i => (i, s"low$i"))
    val highKeys = (1801L to 2000L).map(i => (i, s"high$i"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(lowKeys, highKeys).map { ks =>
      new Thread(() =>
        try LogTable.upsert(spark, t, ks.toDF("k", "v"), "k")
        catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent upsert failed: ${errs.peek()}")
    val r = LogTable.read(spark, t)
    assert(r.count() == 2000L)
    assert(rows(r.filter(col("k") <= 200L)) == lowKeys.toSet)
    assert(rows(r.filter(col("k") >= 1801L)) == highKeys.toSet)
    // both writers committed: the log advanced past both
    assert(LogTable.version(t) >= 3L)
  }

  test("conflicting upserts to the SAME keys serialize: the loser recomputes, one writer wins wholly") {
    val t = tmpTable()
    LogTable.create(spark, t,
      (1L to 500L).map(i => (i, s"base$i")).toDF("k", "v"), "k")
    val v0 = LogTable.version(t)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("alpha", "beta").map { tag =>
      new Thread(() =>
        try LogTable.upsert(spark, t,
          (1L to 100L).map(i => (i, s"$tag$i")).toDF("k", "v"), "k")
        catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"conflicting upsert failed: ${errs.peek()}")
    val r = LogTable.read(spark, t)
    assert(r.count() == 500L, "conflict resolution lost or duplicated rows")
    // serializable outcome: the overlapped keys hold ONE writer's values
    // in full — the loser's recompute ran against the winner's snapshot,
    // so no interleaving of the two batches is possible
    val vals = r.filter(col("k") <= 100L).select("v")
      .collect().map(_.getString(0)).toSet
    val alphaAll = (1L to 100L).map(i => s"alpha$i").toSet
    val betaAll = (1L to 100L).map(i => s"beta$i").toSet
    assert(vals == alphaAll || vals == betaAll,
      s"interleaved writer values survived the conflict: ${vals.take(5)}")
    assert(LogTable.version(t) >= v0 + 2, "both writers must have committed")
    // untouched keys unchanged
    assert(rows(r.filter(col("k") > 100L)) ==
      (101L to 500L).map(i => (i, s"base$i")).toSet)
  }

  test("a data file no manifest references is invisible (crashed writer)") {
    val t = tmpTable()
    LogTable.create(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k")
    // simulate a writer that died after landing data, before its commit
    val orphanSrc = Files.createTempDirectory("graft-orphan")
    Seq((99L, "orphan")).toDF("k", "v").write.mode("overwrite")
      .parquet(orphanSrc.resolve("p").toString)
    val part = Files.list(orphanSrc.resolve("p")).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(part, Paths.get(t, "data", "deadbeef-orphan.parquet"))
    assert(rows(LogTable.read(spark, t)) == Set((1L, "a"), (2L, "b")),
      "unreferenced data file leaked into the snapshot")
  }

  test("vacuum removes only unreferenced debris; history and head stay intact") {
    val t = tmpTable()
    LogTable.create(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k")
    val v1 = LogTable.version(t)
    LogTable.upsert(spark, t, Seq((2L, "b2")).toDF("k", "v"), "k")
    // plant crashed-writer debris
    Files.write(Paths.get(t, "data", "11111111-orphan.parquet"), Array[Byte](1, 2, 3))
    val removed = LogTable.vacuum(t)
    assert(removed == Seq("11111111-orphan.parquet"), s"vacuumed $removed")
    // superseded-version files survive (time travel stays valid)
    assert(rows(LogTable.readVersion(spark, t, v1)) == Set((1L, "a"), (2L, "b")))
    assert(rows(LogTable.read(spark, t)) == Set((1L, "a"), (2L, "b2")))
    assert(LogTable.vacuum(t).isEmpty)
  }

  test("time travel: earlier versions stay readable after upserts") {
    val t = tmpTable()
    LogTable.create(spark, t, Seq((1L, "v1a"), (2L, "v1b")).toDF("k", "v"), "k")
    val v1 = LogTable.version(t)
    LogTable.upsert(spark, t, Seq((2L, "v2b"), (3L, "v2c")).toDF("k", "v"), "k")
    assert(rows(LogTable.readVersion(spark, t, v1)) == Set((1L, "v1a"), (2L, "v1b")))
    assert(rows(LogTable.read(spark, t)) == Set((1L, "v1a"), (2L, "v2b"), (3L, "v2c")))
  }
}
