package graft.model

import org.apache.spark.sql.types._

/** Schemas for the reference's raw payload shapes (FIXTURES.md §A).
  *
  * Mirrors exactly the fields the reference reads from the WooCommerce REST
  * API: orders (reference `src/etl/transform/normalize_orders.py:23-69`),
  * products (`src/etl/transform/enrich.py:12-19`), refunds
  * (`src/etl/extract/refunds.py:33-54`). Money arrives as decimal STRINGS
  * and is cast null-safely to DOUBLE downstream.
  */
object WooSchemas {

  val lineItem: StructType = StructType(Seq(
    StructField("product_id", LongType),
    StructField("variation_id", LongType),
    StructField("sku", StringType),
    StructField("name", StringType),
    StructField("quantity", IntegerType),
    StructField("price", StringType),
    StructField("total", StringType),
    StructField("subtotal", StringType),
    StructField("tax_class", StringType),
  ))

  val rawOrder: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("date_created_gmt", StringType),
    StructField("date_created", StringType),
    StructField("status", StringType),
    StructField("currency", StringType),
    StructField("customer_id", LongType),
    StructField("discount_total", StringType),
    StructField("discount_tax", StringType),
    StructField("shipping_total", StringType),
    StructField("shipping_tax", StringType),
    StructField("cart_tax", StringType),
    StructField("total_tax", StringType),
    StructField("total", StringType),
    StructField("billing", StructType(Seq(
      StructField("country", StringType),
      StructField("city", StringType)))),
    StructField("line_items", ArrayType(lineItem)),
  ))

  val rawProduct: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("categories", ArrayType(StructType(Seq(
      StructField("name", StringType))))),
  ))

  val rawRefund: StructType = StructType(Seq(
    StructField("order_id", LongType),
    StructField("amount", StringType),
    StructField("line_items", ArrayType(StructType(Seq(
      StructField("product_id", LongType),
      StructField("variation_id", LongType),
      StructField("quantity", IntegerType),
      StructField("total", StringType))))),
  ))

  /** Warehouse schema of the orders fact — reference `src/etl/load/ddl.sql:7-25`,
    * canonical column order `src/etl/load/duckdb_client.py:14-20`. */
  val fctOrders: StructType = StructType(Seq(
    StructField("order_id", LongType),
    StructField("order_date", TimestampType),
    StructField("status", StringType),
    StructField("currency", StringType),
    StructField("customer_id", LongType),
    StructField("discount_total", DoubleType),
    StructField("discount_tax", DoubleType),
    StructField("shipping_total", DoubleType),
    StructField("shipping_tax", DoubleType),
    StructField("cart_tax", DoubleType),
    StructField("total_tax", DoubleType),
    StructField("gross_total", DoubleType),
    StructField("net_total", DoubleType),
    StructField("billing_country", StringType),
    StructField("billing_city", StringType),
    StructField("refund_total", DoubleType),
    StructField("net_after_refunds", DoubleType),
  ))

  /** Warehouse schema of the items fact — reference `src/etl/load/ddl.sql:27-41`,
    * column order `src/etl/load/duckdb_client.py:21-26`. */
  val fctOrderItems: StructType = StructType(Seq(
    StructField("order_id", LongType),
    StructField("order_date", TimestampType),
    StructField("product_id", LongType),
    StructField("variation_id", LongType),
    StructField("sku", StringType),
    StructField("name", StringType),
    StructField("quantity", IntegerType),
    StructField("price", DoubleType),
    StructField("total", DoubleType),
    StructField("subtotal", DoubleType),
    StructField("tax_class", StringType),
    StructField("category_snapshot", StringType),
    StructField("refunded_quantity", IntegerType),
    StructField("refunded_total", DoubleType),
  ))
}
