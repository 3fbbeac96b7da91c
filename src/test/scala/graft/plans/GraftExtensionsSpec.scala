package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def hofSelfDot(c: org.apache.spark.sql.Column) =
    aggregate(zip_with(c, c, (x, y) => x * y), lit(0L), (s, v) => s + v)

  test("rule rewrites the HOF self-dot into native long_dot with identical results") {
    // range (not a LocalRelation) so the optimizer can't constant-fold
    // the whole query away before the plan is inspectable
    val df = spark.range(1, 4).select(col("id"),
      when(col("id") === 3, lit(null))
        .otherwise(array(col("id"), col("id") * 2, lit(3L))).as("v"))
    val q = df.select(col("id"), hofSelfDot(col("v")).as("d"))
    val before = q.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))

    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteLongDotProduct
    try {
      val q2 = df.select(col("id"), hofSelfDot(col("v")).as("d"))
      val optimized = q2.queryExecution.optimizedPlan.toString
      assert(optimized.contains("long_dot"), optimized)
      assert(!optimized.contains("aggregate(zip_with"), optimized)
      val after = q2.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1)))
      assert(after.sortBy(_._1).sameElements(before.sortBy(_._1)))
      assert(after.toMap.apply(1L) == 14L) // [1,2,3]·[1,2,3]
      assert(after.toMap.apply(3L) == null) // NULL array → NULL dot
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule does NOT touch dots of two different arrays (semantics guard)") {
    val df = spark.range(1, 2).select(
      array(col("id"), col("id")).as("a"),
      array(col("id"), col("id"), lit(5L)).as("b"))
    val q = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (s, v) => s + v).as("d"))
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteLongDotProduct
    try {
      assert(!q.queryExecution.optimizedPlan.toString.contains("long_dot"))
      // unequal lengths: zip_with null-pads → product NULL → sum NULL
      assert(q.head().isNullAt(0))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule does NOT touch arrays with nullable elements (NULL-element semantics guard)") {
    // A NULL element makes the HOF spelling return NULL; long_dot would
    // read the slot as a value and fabricate a finite sum — so the rule
    // must leave containsNull=true arrays on the built-in path.
    val df = spark.range(1, 3).select(col("id"),
      array(col("id"), when(col("id") === 2, lit(null)).otherwise(col("id") * 2)).as("v"))
    assert(df.schema("v").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val q = df.select(col("id"), hofSelfDot(col("v")).as("d"))
    val before = q.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toMap

    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteLongDotProduct
    try {
      val q2 = df.select(col("id"), hofSelfDot(col("v")).as("d"))
      assert(!q2.queryExecution.optimizedPlan.toString.contains("long_dot"))
      val after = q2.collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1))).toMap
      assert(after == before)
      assert(after(1L) == 5L)   // [1,2]·[1,2]
      assert(after(2L) == null) // NULL element → NULL dot, both paths
    } finally spark.experimental.extraOptimizations = prev
  }

  test("GraftExtensions class injects the rule (spark.sql.extensions entry point)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.GraftColumnBridge.optimizerRules(ext, spark)
    assert(rules.contains(RewriteLongDotProduct))
  }
}
