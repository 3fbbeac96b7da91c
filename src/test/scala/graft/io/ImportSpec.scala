package graft.io

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The warehouse import (Tables.table re-layout) contract:
  * layout-independent results, row-count-gated splitting, and flag-off
  * pass-through. Runs against the sf0.001 fixture (all tables below the
  * split threshold → served originals even when enabled) and a
  * synthetic row-heavy table exercising the actual split. */
class ImportSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  // importEnabled also reads the env var, which a test JVM can't unset —
  // flag-off assertions below would silently invert under a bench shell
  // that exports it, so skip cleanly there
  private val envClean = !sys.env.contains("SPARK_GRAFT_IMPORT")

  private def withImport[T](body: => T): T = {
    sys.props("graft.import") = "1"
    try body
    finally sys.props.remove("graft.import")
  }

  private def deleteRecursively(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(deleteRecursively)
    p.delete()
  }

  test("tables under the split threshold serve the original single file") {
    assume(envClean)
    val d = "/root/testdata/sf0.001"
    withImport {
      val df = Tables.lineitem(spark, d) // 6k rows at sf0.001 — below 2×25k
      assert(df.inputFiles.length == 1)
      assert(df.inputFiles.head.contains("/root/testdata"))
    }
  }

  test("row-heavy tables split by row count and results are layout-independent") {
    assume(envClean)
    val dir = java.nio.file.Files.createTempDirectory("graft_import_spec").toString
    try {
      import spark.implicits._
      // 120k rows → 120k/25k = 4 files
      (1L to 120000L).map(i => (i, i % 97, s"v$i"))
        .toDF("o_orderkey", "k", "v")
        .coalesce(1).write.parquet(s"$dir/orders.parquet")
      val plain = Tables.orders(spark, dir)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("o_orderkey").as("s"))
        .orderBy("k").collect().toSeq
      val (files, imported, importedPath) = withImport {
        val df = Tables.orders(spark, dir)
        (df.inputFiles.length,
          df.groupBy("k").agg(count(lit(1)).as("n"), sum("o_orderkey").as("s"))
            .orderBy("k").collect().toSeq,
          df.inputFiles.headOption.map(f =>
            new java.io.File(new java.net.URI(f)).getParentFile))
      }
      assert(files == 4, s"expected 4 imported files, got $files")
      assert(imported == plain)
      // flag off again → original single file (no sticky state)
      assert(Tables.orders(spark, dir).inputFiles.length == 1)
      // drop the RAM-backed import copy — repeated suite runs must not
      // accumulate tmpfs state under the bench's scratch dir
      importedPath.foreach(deleteRecursively)
    } finally deleteRecursively(new java.io.File(dir))
  }

  test("a regenerated source is re-imported, never served from a stale copy") {
    assume(envClean)
    // The driver rewrites /root/testdata fixtures between rounds while
    // the import scratch dir (/dev/shm) survives — a parts-only key
    // would hand the new session the OLD bytes. The source fingerprint
    // (md5 of the sorted per-part (name, length, mtime) manifest) must
    // force a fresh import.
    val dir = java.nio.file.Files.createTempDirectory("graft_import_regen").toString
    try {
      import spark.implicits._
      def write(tag: String): Unit = {
        val f = new java.io.File(s"$dir/orders.parquet")
        if (f.exists()) deleteRecursively(f)
        (1L to 120000L).map(i => (i, i % 97, s"$tag$i"))
          .toDF("o_orderkey", "k", "v")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
        Tables.clearSchemaCache()
      }
      write("a")
      val copies = scala.collection.mutable.Buffer.empty[java.io.File]
      val first = withImport {
        val df = Tables.orders(spark, dir)
        df.inputFiles.headOption.foreach(f =>
          copies += new java.io.File(new java.net.URI(f)).getParentFile)
        df.filter(col("o_orderkey") === 1L).select("v").collect().head.getString(0)
      }
      assert(first == "a1")
      // regenerate in place: same schema, same rows, different content
      Thread.sleep(1100) // mtime granularity can be 1s on some filesystems
      write("b")
      val second = withImport {
        val df = Tables.orders(spark, dir)
        df.inputFiles.headOption.foreach(f =>
          copies += new java.io.File(new java.net.URI(f)).getParentFile)
        df.filter(col("o_orderkey") === 1L).select("v").collect().head.getString(0)
      }
      assert(second == "b1",
        "import served stale pre-regeneration content")
      copies.distinct.foreach(deleteRecursively)
    } finally deleteRecursively(new java.io.File(dir))
  }
}
