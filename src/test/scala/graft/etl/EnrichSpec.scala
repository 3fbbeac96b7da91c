package graft.etl

import graft.SparkTestSession
import graft.model.WooSchemas
import org.scalatest.funsuite.AnyFunSuite

class EnrichSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def orders(rows: String*) =
    Normalize.orders(SparkTestSession.readJson(WooSchemas.rawOrder, rows: _*))
  private def items(rows: String*) =
    Normalize.items(SparkTestSession.readJson(WooSchemas.rawOrder, rows: _*))
  private def products(rows: String*) =
    SparkTestSession.readJson(WooSchemas.rawProduct, rows: _*)
  private def refunds(rows: String*) =
    SparkTestSession.readJson(WooSchemas.rawRefund, rows: _*)

  test("category snapshot: multi -> 'A | B', empty -> NULL, unknown product -> NULL") {
    val it = items(
      """{"id":1,"line_items":[{"product_id":10,"quantity":1},{"product_id":11,"quantity":1},{"product_id":99,"quantity":1}]}""")
    val pr = products(
      """{"id":10,"categories":[{"name":"Hoodies"},{"name":"Sale"}]}""",
      """{"id":11,"categories":[]}""")
    val got = Enrich.itemsWithCategories(it, pr)
      .orderBy("product_id").select("product_id", "category_snapshot").collect()
    assert(got(0).getString(1) == "Hoodies | Sale")
    assert(got(1).isNullAt(1)) // empty categories
    assert(got(2).isNullAt(1)) // no product row
  }

  test("order refunds: missing order -> 0.0; net_after_refunds = net - refund") {
    val o = orders(
      """{"id":1,"total":"100.00","total_tax":"10.00"}""",
      """{"id":2,"total":"50.00","total_tax":"0"}""")
    val r = refunds(
      """{"order_id":1,"amount":"30.00"}""",
      """{"order_id":1,"amount":"5.00"}""")
    val got = Enrich.applyOrderRefunds(o, Enrich.refundOrderTotals(r))
      .orderBy("order_id")
      .select("order_id", "refund_total", "net_after_refunds").collect()
    assert(got(0).getDouble(1) == 35.0)
    assert(got(0).getDouble(2) == 90.0 - 35.0)
    assert(got(1).getDouble(1) == 0.0)
    assert(got(1).getDouble(2) == 50.0)
  }

  test("item refunds: composite key with NULL variation_id matching 0") {
    val it = items(
      """{"id":1,"line_items":[
           {"product_id":10,"quantity":3,"total":"30.00"},
           {"product_id":10,"variation_id":5,"quantity":2,"total":"20.00"}]}"""
        .replaceAll("\n\\s*", ""))
    // refund line has variation_id null -> keys as 0 -> matches the
    // item whose variation_id is null (also keyed 0)
    val r = refunds(
      """{"order_id":1,"amount":"10.00","line_items":[
           {"product_id":10,"variation_id":null,"quantity":1,"total":"10.00"}]}"""
        .replaceAll("\n\\s*", ""))
    val got = Enrich.applyItemRefunds(it, Enrich.refundItemTotals(r))
      .orderBy("variation_id")
      .select("variation_id", "refunded_quantity", "refunded_total").collect()
    // Spark sorts NULL first ascending: row 0 is the null-variation item
    assert(got(0).isNullAt(0))
    assert(got(0).getInt(1) == 1 && got(0).getDouble(2) == 10.0)
    assert(got(1).getLong(0) == 5L)
    assert(got(1).getInt(1) == 0 && got(1).getDouble(2) == 0.0)
  }

  test("item refunds aggregate across refund payloads per (pid,vid)") {
    val r = refunds(
      """{"order_id":1,"line_items":[{"product_id":10,"quantity":1,"total":"5.00"}]}""",
      """{"order_id":1,"line_items":[{"product_id":10,"quantity":2,"total":"7.50"}]}""")
    val got = Enrich.refundItemTotals(r).collect()(0)
    assert(got.getAs[Int]("refunded_quantity") == 3)
    assert(got.getAs[Double]("refunded_total") == 12.5)
  }
}
