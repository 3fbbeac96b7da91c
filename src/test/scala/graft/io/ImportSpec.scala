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

  private def withImport[T](body: => T): T = {
    sys.props("graft.import") = "1"
    try body
    finally sys.props.remove("graft.import")
  }

  test("tables under the split threshold serve the original single file") {
    val d = "/root/testdata/sf0.001"
    withImport {
      val df = Tables.lineitem(spark, d) // 6k rows at sf0.001 — below 2×25k
      assert(df.inputFiles.length == 1)
      assert(df.inputFiles.head.contains("/root/testdata"))
    }
  }

  test("row-heavy tables split by row count and results are layout-independent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_import_spec").toString
    import spark.implicits._
    // 120k rows → 120k/25k = 4 files
    (1L to 120000L).map(i => (i, i % 97, s"v$i"))
      .toDF("o_orderkey", "k", "v")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val plain = Tables.orders(spark, dir)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("o_orderkey").as("s"))
      .orderBy("k").collect().toSeq
    val (files, imported) = withImport {
      val df = Tables.orders(spark, dir)
      (df.inputFiles.length,
        df.groupBy("k").agg(count(lit(1)).as("n"), sum("o_orderkey").as("s"))
          .orderBy("k").collect().toSeq)
    }
    assert(files == 4, s"expected 4 imported files, got $files")
    assert(imported == plain)
    // flag off again → original single file (no sticky state)
    assert(Tables.orders(spark, dir).inputFiles.length == 1)
  }
}
