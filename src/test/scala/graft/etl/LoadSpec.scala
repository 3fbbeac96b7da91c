package graft.etl

import graft.SparkTestSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class LoadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("upsert keyed on order_id replaces ALL items of touched orders (K3)") {
    // order 1 originally has items A,B; re-sync sends only A -> B must vanish
    val existing = Seq((1L, "A"), (1L, "B"), (2L, "C")).toDF("order_id", "sku")
    val incoming = Seq((1L, "A")).toDF("order_id", "sku")
    val got = Load.upsert(existing, incoming, Seq("order_id"))
      .orderBy("order_id", "sku").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "A"), (2L, "C")))
  }

  test("upsert is idempotent: applying the same batch twice equals once") {
    val existing = Seq((1L, 10.0), (2L, 20.0)).toDF("order_id", "total")
    val batch = Seq((2L, 25.0), (3L, 30.0)).toDF("order_id", "total")
    val once = Load.upsert(existing, batch, Seq("order_id"))
    val twice = Load.upsert(once, batch, Seq("order_id"))
    assert(once.orderBy("order_id").collect().toSeq ==
      twice.orderBy("order_id").collect().toSeq)
  }

  test("alignColumns adds typed NULLs and projects canonical order (K4/K6)") {
    val df = Seq((1L, "x")).toDF("order_id", "sku")
    val target = StructType(Seq(
      StructField("order_id", LongType),
      StructField("refund_total", DoubleType),
      StructField("sku", StringType)))
    val got = Load.alignColumns(df, target)
    assert(got.columns.toSeq == Seq("order_id", "refund_total", "sku"))
    val r = got.collect()(0)
    assert(r.isNullAt(1) && r.getString(2) == "x")
  }

  test("updateFromMap fills only missing/blank unless forced (K5)") {
    val items = Seq(
      (1L, 10L, null.asInstanceOf[String]),
      (2L, 10L, ""),
      (3L, 10L, "Keep"),
      (4L, 99L, null.asInstanceOf[String]), // no mapping row -> stays null
    ).toDF("order_id", "product_id", "category_snapshot")
    val mapping = Seq((10L, "New")).toDF("product_id", "category_snapshot")
    val got = Load.updateFromMap(items, mapping, force = false)
      .orderBy("order_id").select("category_snapshot").collect()
    assert(got(0).getString(0) == "New")
    assert(got(1).getString(0) == "New")
    assert(got(2).getString(0) == "Keep")
    assert(got(3).isNullAt(0))
    val forced = Load.updateFromMap(items, mapping, force = true)
      .orderBy("order_id").select("category_snapshot").collect()
    assert(forced(2).getString(0) == "New")
  }

  test("updateFromMap takes a matched NULL mapping value — force clears a stale snapshot (run.py:78-94)") {
    // product 10 lost all categories: its mapping row exists with a NULL
    // value (run.py's map_df carries None). Reference force_all UPDATE
    // writes that NULL; keep-old-on-null would preserve a stale category.
    val items = Seq(
      (1L, 10L, "Stale"),
      (2L, 10L, null.asInstanceOf[String]), // missing -> matched NULL fills (still null)
      (3L, 99L, "Keep"), // no mapping row -> untouched even under force
    ).toDF("order_id", "product_id", "category_snapshot")
    val mapping = Seq((10L, null.asInstanceOf[String]))
      .toDF("product_id", "category_snapshot")
    val unforced = Load.updateFromMap(items, mapping, force = false)
      .orderBy("order_id").select("category_snapshot").collect()
    assert(unforced(0).getString(0) == "Stale") // not missing, not forced
    assert(unforced(1).isNullAt(0))
    assert(unforced(2).getString(0) == "Keep")
    val forced = Load.updateFromMap(items, mapping, force = true)
      .orderBy("order_id").select("category_snapshot").collect()
    assert(forced(0).isNullAt(0), "force must clear the stale snapshot to the mapped NULL")
    assert(forced(1).isNullAt(0))
    assert(forced(2).getString(0) == "Keep", "unmatched rows stay untouched under force")
  }

  test("upsertParquet: first write, then keyed overwrite survives re-read") {
    val dir = Files.createTempDirectory("graft_upsert").toString + "/fct"
    Load.upsertParquet(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("order_id", "v"), Seq("order_id"))
    Load.upsertParquet(spark, dir,
      Seq((2L, "b2"), (3L, "c")).toDF("order_id", "v"), Seq("order_id"))
    val got = spark.read.parquet(dir).orderBy("order_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }

  test("compact merges small-file debris via the staged swap; data identical") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/fct"
    val df = (1L to 64L).map(i => (i, s"v$i")).toDF("order_id", "v")
    df.repartition(8).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(_.getPath.getName.startsWith("part-"))
    assert(partFiles() == 8)
    Load.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(partFiles() == 1)
    val got = spark.read.parquet(dir).orderBy("order_id")
      .as[(Long, String)].collect().toSeq
    assert(got == (1L to 64L).map(i => (i, s"v$i")))
  }

  test("partitioned upsert rewrites ONLY touched partitions; untouched files stay put") {
    val dir = Files.createTempDirectory("graft_pupsert").toString + "/fct"
    val b1 = Seq((1L, "2024-01", "a"), (2L, "2024-01", "b"), (3L, "2024-02", "c"))
      .toDF("order_id", "month", "v")
    Load.upsertParquetPartitioned(spark, dir, b1, Seq("order_id"), "month")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listing(p: String) = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .map(s => (s.getPath.getName, s.getModificationTime, s.getLen)).toSet
    val janBefore = listing(s"$dir/month=2024-01")

    val b2 = Seq((3L, "2024-02", "c2"), (4L, "2024-02", "d"))
      .toDF("order_id", "month", "v")
    Load.upsertParquetPartitioned(spark, dir, b2, Seq("order_id"), "month")
    // January: same files, same mtimes — provably not rewritten
    assert(listing(s"$dir/month=2024-01") == janBefore)
    val got = spark.read.parquet(dir)
      .select("order_id", "month", "v").orderBy("order_id")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "2024-01", "a"), (2L, "2024-01", "b"),
      (3L, "2024-02", "c2"), (4L, "2024-02", "d")))
  }

  test("partitioned upsert recovers a half-swapped partition from a crashed run") {
    val dir = Files.createTempDirectory("graft_pupsert_cr").toString + "/fct"
    Load.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01", "a"), (3L, "2024-02", "c")).toDF("order_id", "month", "v"),
      Seq("order_id"), "month")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate dying between the two swap renames: live partition moved
    // to the holding name, staged rename never happened
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/month=2024-02"),
      new org.apache.hadoop.fs.Path(s"$dir/._old_month=2024-02")))
    // the table currently reads WITHOUT february
    assert(spark.read.parquet(dir).count() == 1)
    // next run (touching only january) must first restore february
    Load.upsertParquetPartitioned(spark, dir,
      Seq((2L, "2024-01", "b")).toDF("order_id", "month", "v"),
      Seq("order_id"), "month")
    val got = spark.read.parquet(dir)
      .select("order_id", "month", "v").orderBy("order_id")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "2024-01", "a"), (2L, "2024-01", "b"),
      (3L, "2024-02", "c")))
  }

  test("partitioned upsert follows a key whose partition value moved (no stale duplicate)") {
    val dir = Files.createTempDirectory("graft_pupsert_mv").toString + "/fct"
    Load.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01", "a"), (2L, "2024-01", "b"), (3L, "2024-02", "c"))
        .toDF("order_id", "month", "v"),
      Seq("order_id"), "month")
    // order 3's date moved into january: its february row must disappear
    Load.upsertParquetPartitioned(spark, dir,
      Seq((3L, "2024-01", "c-moved")).toDF("order_id", "month", "v"),
      Seq("order_id"), "month")
    val got = spark.read.parquet(dir)
      .select("order_id", "month", "v").orderBy("order_id")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "2024-01", "a"), (2L, "2024-01", "b"),
      (3L, "2024-01", "c-moved")))
    // february drained to zero rows and its directory is gone
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/month=2024-02")))
  }

  test("partitioned upsert handles values Spark path-escapes and NULL partitions") {
    val dir = Files.createTempDirectory("graft_pupsert_esc").toString + "/fct"
    // ':' is escaped to %3A in Hive dir names; null lands in the Hive
    // default partition — both must survive a second upsert untouched
    val b1 = Seq((1L, Some("2024:01"), "a"), (2L, None, "b"), (3L, Some("2024:02"), "c"))
      .toDF("order_id", "month", "v")
    Load.upsertParquetPartitioned(spark, dir, b1, Seq("order_id"), "month")
    Load.upsertParquetPartitioned(spark, dir,
      Seq((3L, Some("2024:02"), "c2"), (4L, None, "d"))
        .toDF("order_id", "month", "v"),
      Seq("order_id"), "month")
    val got = spark.read.parquet(dir)
      .select("order_id", "month", "v").orderBy("order_id")
      .as[(Long, Option[String], String)].collect().toSeq
    assert(got == Seq((1L, Some("2024:01"), "a"), (2L, None, "b"),
      (3L, Some("2024:02"), "c2"), (4L, None, "d")))
  }

  test("compact refuses a Hive-partitioned table instead of flattening it") {
    val dir = Files.createTempDirectory("graft_compact_part").toString + "/fct"
    Load.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01", "a")).toDF("order_id", "month", "v"),
      Seq("order_id"), "month")
    val e = intercept[IllegalArgumentException](Load.compact(spark, dir))
    assert(e.getMessage.contains("flat-table-only"))
    // table untouched
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("upsertParquet: rename refusing with FALSE fails loudly, table intact") {
    // Hadoop rename reports some failures by returning false, not
    // throwing; the swap must surface that, never half-complete silently.
    spark.sparkContext.hadoopConfiguration
      .set("fs.failfs.impl", classOf[RefusingRenameFs].getName)
    val local = Files.createTempDirectory("graft_failfs").toString + "/fct"
    val dir = "failfs://" + local
    Load.upsertParquet(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("order_id", "v"), Seq("order_id"))
    RefusingRenameFs.refuseOldSwap = true
    try {
      val e = intercept[java.io.IOException] {
        Load.upsertParquet(spark, dir,
          Seq((2L, "b2")).toDF("order_id", "v"), Seq("order_id"))
      }
      assert(e.getMessage.contains("rename"), e.getMessage)
    } finally RefusingRenameFs.refuseOldSwap = false
    // the failed swap must not have touched the live table
    val got = spark.read.parquet(dir).orderBy("order_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b")))
    // and a later retry (rename healthy again) must succeed normally
    Load.upsertParquet(spark, dir,
      Seq((2L, "b2")).toDF("order_id", "v"), Seq("order_id"))
    assert(spark.read.parquet(dir).orderBy("order_id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b2")))
  }
}
