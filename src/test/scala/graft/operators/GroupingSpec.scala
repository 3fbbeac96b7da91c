package graft.operators

import graft.SparkTestSession
import graft.util.Parity._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Grouping.lowCardRollup]]/[[Grouping.lowCardCube]] row-for-row
  * against Spark's native rollup/cube — including NULL dimension VALUES,
  * which must stay distinguishable from margin NULLs via the grouping
  * flags in both spellings. */
class GroupingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // rf=null rows exercise data-null vs margin-null
  private def input = Seq(
    ("R", "F", 2.0), ("R", "O", 3.5), ("R", "F", 1.25),
    ("A", "F", 4.0), (null, "O", 8.0), (null, "O", 0.5)
  ).toDF("rf", "ls", "amt")

  private def canon(df: DataFrame): Seq[(String, String, Double, Long, Int, Int)] =
    df.collect().map { r =>
      (Option(r.getString(0)).getOrElse("<null>"),
        Option(r.getString(1)).getOrElse("<null>"),
        r.getDouble(2), r.getLong(3), r.getInt(4), r.getInt(5))
    }.toSeq.sorted

  private val partials = Seq(
    sum(moneyMicros(col("amt"))).as("_a"), count(lit(1)).as("_n"))
  private def reaggs = Seq(
    microsToMoney(sum(col("_a"))).as("s"),
    sum(col("_n")).as("n"),
    grouping(col("rf")).cast("int").as("g_rf"),
    grouping(col("ls")).cast("int").as("g_ls"))
  private val finals = Seq(col("s"), col("n"), col("g_rf"), col("g_ls"))

  test("lowCardRollup equals native rollup (with null dim values)") {
    val native = input.rollup(col("rf"), col("ls"))
      .agg(moneySum(col("amt")).as("s"), count(lit(1)).as("n"),
        grouping(col("rf")).cast("int").as("g_rf"),
        grouping(col("ls")).cast("int").as("g_ls"))
    val lowCard = Grouping.lowCardRollup(input, "rf", "ls", partials, reaggs, finals)
    assert(canon(lowCard) == canon(native))
    assert(canon(lowCard).size == 8) // 4 leaf + 3 rf-margin + grand total
  }

  test("lowCardCube equals native cube (with null dim values)") {
    val native = input.cube(col("rf"), col("ls"))
      .agg(moneySum(col("amt")).as("s"), count(lit(1)).as("n"),
        grouping(col("rf")).cast("int").as("g_rf"),
        grouping(col("ls")).cast("int").as("g_ls"))
    val lowCard = Grouping.lowCardCube(input, "rf", "ls", partials, reaggs, finals)
    assert(canon(lowCard) == canon(native))
  }

  test("property: lowCard rollup+cube equal native on randomized data") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val dims1 = Array("A", "B", "C", null)
      val dims2 = Array("x", "y", null)
      val rows = Seq.fill(60 + trial * 17)((
        dims1(rnd.nextInt(dims1.length)),
        dims2(rnd.nextInt(dims2.length)),
        // money-like: 2-decimal values, occasionally negative (refunds)
        (rnd.nextInt(40000) - 5000) / 100.0))
      val df = rows.toDF("rf", "ls", "amt").repartition(7) // multi-partition
      val nativeCube = df.cube(col("rf"), col("ls"))
        .agg(moneySum(col("amt")).as("s"), count(lit(1)).as("n"),
          grouping(col("rf")).cast("int").as("g_rf"),
          grouping(col("ls")).cast("int").as("g_ls"))
      val lowCube = Grouping.lowCardCube(df, "rf", "ls", partials, reaggs, finals)
      assert(canon(lowCube) == canon(nativeCube), s"cube trial $trial")
      val nativeRoll = df.rollup(col("rf"), col("ls"))
        .agg(moneySum(col("amt")).as("s"), count(lit(1)).as("n"),
          grouping(col("rf")).cast("int").as("g_rf"),
          grouping(col("ls")).cast("int").as("g_ls"))
      val lowRoll = Grouping.lowCardRollup(df, "rf", "ls", partials, reaggs, finals)
      assert(canon(lowRoll) == canon(nativeRoll), s"rollup trial $trial")
    }
  }

  test("the heavy pass has no Expand over the input") {
    val lowCard = Grouping.lowCardCube(input, "rf", "ls", partials, reaggs, finals)
    val plan = lowCard.queryExecution.executedPlan.toString
    // exactly one Expand (over the base aggregate), and it must sit ABOVE
    // the first aggregation, not between scan and partial agg
    assert(plan.contains("Expand"))
    val firstAgg = plan.lastIndexOf("HashAggregate")
    val expand = plan.indexOf("Expand")
    assert(expand < firstAgg,
      "Expand must consume the base aggregate, not the raw input")
  }
}
