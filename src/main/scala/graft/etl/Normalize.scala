package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw order JSON → (orders fact, items fact).
  *
  * Re-expresses the reference's row-loop flatten
  * (reference `src/etl/transform/normalize_orders.py:13-77`) as a single
  * declarative projection + `explode` — no UDFs, fully codegen'd, scales
  * linearly with input partitions (no shuffle at all until the final
  * optional sort).
  */
object Normalize {

  /** Null-safe tolerant double cast — the reference's `_f` helper
    * (`normalize_orders.py:6-10`): None/""/unparseable → 0.0.
    * `try_cast` (not `cast`) because Spark 4 runs ANSI mode by default. */
  def f(c: Column): Column = coalesce(c.try_cast("double"), lit(0.0))

  /** Tolerant int cast — `int(x or 0)` (reference `refunds.py:42-43`). */
  def i(c: Column): Column = coalesce(c.try_cast("int"), lit(0))

  /** P2 — ISO parse with `date_created_gmt` → `date_created` fallback
    * (reference `normalize_orders.py:25,29`). Unresolved column
    * expression: resolves against whatever frame it is selected from.
    *
    * Two tolerances the first cut missed: the reference's `gmt or
    * created` is PYTHON-FALSY — an EMPTY string falls back exactly like
    * None, where a bare coalesce would try to parse "" (and under Spark
    * 4's ANSI default, to_timestamp("") THROWS — killing the whole
    * batch, and for [[graft.streaming.OrderStream]] poisoning the
    * checkpoint so every restart replays the same failing micro-batch).
    * So: empties nullify before the fallback, and try_to_timestamp
    * NULLs malformed values instead of throwing — the same tolerant-cast
    * convention as [[f]]/[[i]] right above. */
  def orderTs: Column = {
    def nz(c: Column) = nullif(trim(c), lit(""))
    try_to_timestamp(
      coalesce(nz(col("date_created_gmt")), nz(col("date_created"))))
  }

  /** Orders projection (P1-P4): 17 columns, placeholders
    * refund_total=0.0 / net_after_refunds=NULL filled by [[Enrich]]
    * (reference `normalize_orders.py:27-49`). */
  def orders(raw: DataFrame): DataFrame = {
    raw.select(
      col("id").as("order_id"),
      orderTs.as("order_date"),
      col("status"),
      col("currency"),
      col("customer_id"),
      f(col("discount_total")).as("discount_total"),
      f(col("discount_tax")).as("discount_tax"),
      f(col("shipping_total")).as("shipping_total"),
      f(col("shipping_tax")).as("shipping_tax"),
      f(col("cart_tax")).as("cart_tax"),
      f(col("total_tax")).as("total_tax"),
      f(col("total")).as("gross_total"),
      (f(col("total")) - f(col("total_tax"))).as("net_total"),
      col("billing.country").as("billing_country"),
      col("billing.city").as("billing_city"),
      lit(0.0).as("refund_total"),
      lit(null).cast("double").as("net_after_refunds"),
    )
  }

  /** Items fact: one row per line item (UDTF-shaped 1→N in the reference,
    * `normalize_orders.py:51-69`; here a built-in Generator). `line_items:
    * null` behaves as empty — the reference's `or []` guard — via
    * coalesce-to-empty-array before the (non-outer) explode. */
  def items(raw: DataFrame): DataFrame = {
    raw
      .select(
        col("id").as("order_id"),
        orderTs.as("order_date"),
        explode(coalesce(col("line_items"), array())).as("it"))
      .select(
        col("order_id"),
        col("order_date"),
        col("it.product_id").as("product_id"),
        col("it.variation_id").as("variation_id"),
        col("it.sku").as("sku"),
        col("it.name").as("name"),
        i(col("it.quantity")).as("quantity"),
        f(col("it.price")).as("price"),
        f(col("it.total")).as("total"),
        f(col("it.subtotal")).as("subtotal"),
        col("it.tax_class").as("tax_class"),
        lit(null).cast("string").as("category_snapshot"),
        lit(0).as("refunded_quantity"),
        lit(0.0).as("refunded_total"),
      )
  }

  /** Full normalize — both facts, orders sorted by date as the reference does
    * post-normalize (O1, `normalize_orders.py:74-75`). The sort is cosmetic
    * for a warehouse load; callers at scale should skip it (total sorts
    * shuffle everything) — kept optional for behavioral fidelity. */
  def apply(raw: DataFrame, sorted: Boolean = false): (DataFrame, DataFrame) = {
    val o = orders(raw)
    (if (sorted) o.orderBy("order_date") else o, items(raw))
  }
}
