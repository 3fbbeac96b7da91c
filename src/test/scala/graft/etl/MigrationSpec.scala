package graft.etl

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** K6 — schema evolution, both directions the reference handles
  * (`src/tools/migrate_duckdb.py:7-26`: introspect + ADD COLUMN):
  * reading mixed-generation parquet with mergeSchema, and migrating a
  * table forward with alignColumns. */
class MigrationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("mergeSchema unifies old and new file generations; missing column reads as NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-migrate").toString
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/t/gen=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/t/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.schema.fieldNames.toSet == Set("id", "name", "score", "gen"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), Option(r.getAs[Any]("score"))))
    assert(rows.toSeq == Seq((1L, None), (2L, Some(9.5))))
  }

  test("alignColumns migrates an old table to a new schema in one rewrite") {
    val old = Seq((1L, "x")).toDF("order_id", "status")
    val target = StructType(Seq(
      StructField("order_id", LongType),
      StructField("status", StringType),
      StructField("refund_total", DoubleType))) // the ALTER TABLE ADD COLUMN
    val migrated = Load.alignColumns(old, target)
    assert(migrated.schema.fields.map(_.name).toSeq ==
      Seq("order_id", "status", "refund_total"))
    assert(migrated.head().isNullAt(2))
  }
}
