package graft.etl

import graft.SparkTestSession
import graft.model.WooSchemas
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases pinned to reference behaviors (FIXTURES.md §A). */
class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def raw(rows: String*) =
    SparkTestSession.readJson(WooSchemas.rawOrder, rows: _*)

  test("money strings cast null-safely: bad/empty/missing -> 0.0 (_f semantics)") {
    val df = raw(
      """{"id":1,"date_created_gmt":"2024-01-02T03:04:05","status":"completed",
         "total":"abc","total_tax":"","discount_total":null,"shipping_total":"12.50"}"""
        .replaceAll("\n\\s*", ""))
    val o = Normalize.orders(df).collect()(0)
    assert(o.getAs[Double]("gross_total") == 0.0)     // "abc" -> 0.0
    assert(o.getAs[Double]("total_tax") == 0.0)       // ""    -> 0.0
    assert(o.getAs[Double]("discount_total") == 0.0)  // null  -> 0.0
    assert(o.getAs[Double]("shipping_total") == 12.5)
    assert(o.getAs[Double]("net_total") == 0.0)       // 0.0 - 0.0
  }

  test("timestamp: date_created_gmt primary, date_created fallback") {
    val df = raw(
      """{"id":1,"date_created_gmt":"2024-01-02T03:04:05","date_created":"2023-12-31T00:00:00","total":"1"}""",
      """{"id":2,"date_created":"2023-12-31T06:07:08","total":"1"}""")
    val got = Normalize.orders(df).orderBy("order_id")
      .select("order_date").collect().map(_.get(0).toString)
    assert(got(0) == "2024-01-02 03:04:05.0")
    assert(got(1) == "2023-12-31 06:07:08.0")
  }

  test("timestamp tolerances: EMPTY gmt falls back (Python-falsy), malformed -> NULL, never a crash") {
    // the reference's `gmt or created` treats "" like None; a bare
    // coalesce would try to parse "" and under ANSI KILL the batch (and
    // poison a streaming checkpoint — every restart replays the poison)
    val df = raw(
      """{"id":1,"date_created_gmt":"","date_created":"2024-01-02T03:04:05","total":"1"}""",
      """{"id":2,"date_created_gmt":"not-a-date","total":"1"}""",
      """{"id":3,"date_created_gmt":"  ","date_created":"","total":"1"}""")
    val got = Normalize.orders(df).orderBy("order_id")
      .select("order_date").collect()
    assert(got(0).get(0).toString == "2024-01-02 03:04:05.0",
      "empty gmt must fall back to date_created")
    assert(got(1).isNullAt(0), "malformed date must NULL, not throw")
    assert(got(2).isNullAt(0), "whitespace/empty on both sides -> NULL")
  }

  test("line_items null or empty -> zero item rows; N items -> N rows") {
    val df = raw(
      """{"id":1,"total":"1","line_items":null}""",
      """{"id":2,"total":"1","line_items":[]}""",
      """{"id":3,"total":"1","line_items":[
           {"product_id":10,"quantity":2,"price":"5.00","total":"10.00","subtotal":"10.00"},
           {"product_id":11,"variation_id":7,"quantity":1,"price":"bad","total":"","subtotal":null}
         ]}""".replaceAll("\n\\s*", ""))
    val items = Normalize.items(df).orderBy("order_id", "product_id").collect()
    assert(items.length == 2)
    assert(items.map(_.getAs[Long]("order_id")).toSeq == Seq(3L, 3L))
    val bad = items(1)
    assert(bad.getAs[Double]("price") == 0.0)
    assert(bad.getAs[Double]("total") == 0.0)
    assert(bad.getAs[Double]("subtotal") == 0.0)
    assert(bad.getAs[Long]("variation_id") == 7L)
    // placeholders filled later by enrich
    assert(bad.getAs[Int]("refunded_quantity") == 0)
    assert(bad.isNullAt(bad.fieldIndex("category_snapshot")))
  }

  test("orders projection matches fct_orders schema; items match fct_order_items") {
    val df = raw("""{"id":1,"total":"5","line_items":[{"product_id":1,"quantity":1}]}""")
    val (o, i) = Normalize(df)
    assert(o.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      WooSchemas.fctOrders.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(i.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      WooSchemas.fctOrderItems.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
