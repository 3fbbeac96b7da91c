package graft.etl

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.3), driven by ScalaCheck
  * generators sampled with FIXED seeds — edge shapes (empty batches,
  * duplicate keys, NULL-ish values, unparseable money strings) appear by
  * construction, and failures reproduce deterministically. Spark jobs are
  * seconds-level, so cases are few-but-adversarial (tiny key spaces →
  * high collision probability). */
class PropertySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic sample stream of `g`. */
  private def samples[T](g: Gen[T], n: Int, size: Int = 12): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default.withSize(size), Seed(i.toLong)))

  private val keyGen = Gen.chooseNum(0L, 5L) // tiny key space → collisions
  private val rowGen = for {
    k <- keyGen
    v <- Gen.chooseNum(-100, 100)
    s <- Gen.oneOf("a", "b", "c")
  } yield (k, v.toDouble, s)
  private val batchGen = Gen.listOf(rowGen)

  test("property: upsert is idempotent and right-biased (K2/K3)") {
    for ((existing, incoming) <- samples(Gen.zip(batchGen, batchGen), 8)) {
      val e = existing.toDF("k", "v", "s")
      val i = incoming.toDF("k", "v", "s")
      val once = Load.upsert(e, i, Seq("k"))
      val twice = Load.upsert(once, i, Seq("k"))
      // idempotent: applying the same batch again changes nothing
      assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
      // right-biased: incoming keys carry exactly incoming's rows
      val ks = incoming.map(_._1).distinct
      val kept = once.filter(col("k").isin(ks: _*))
      assert(kept.except(i).isEmpty && i.except(kept).isEmpty)
      // untouched: keys absent from incoming survive verbatim
      val untouched = once.filter(!col("k").isin(ks: _*))
      val expected = e.filter(!col("k").isin(ks: _*))
      assert(untouched.except(expected).isEmpty && expected.except(untouched).isEmpty)
    }
  }

  test("property: net_after_refunds = net_total − refund_total, missing → 0 (J2/P5)") {
    val orderGen = Gen.listOf(Gen.zip(keyGen, Gen.chooseNum(0, 500)))
    val refundGen = Gen.listOf(Gen.zip(keyGen, Gen.chooseNum(0, 50)))
    for ((ordersRaw0, refundsRaw) <- samples(Gen.zip(orderGen, refundGen), 8)) {
      val ordersRaw = ordersRaw0.distinctBy(_._1) // unique order ids
      val orders = ordersRaw.map { case (k, n) => (k, n.toDouble) }
        .toDF("order_id", "net_total")
        .withColumn("refund_total", lit(0.0))
        .withColumn("net_after_refunds", lit(null).cast("double"))
      val refunds = refundsRaw.map { case (k, a) => (k, a.toString) }
        .toDF("order_id", "amount")
      val out = Enrich.applyOrderRefunds(orders, Enrich.refundOrderTotals(refunds))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      val refundByKey = refundsRaw.groupBy(_._1)
        .view.mapValues(_.map(_._2.toDouble).sum).toMap
      assert(out.length == ordersRaw.length)
      out.foreach { case (k, net, rt, nar) =>
        assert(rt == refundByKey.getOrElse(k, 0.0), s"key $k")
        assert(nar == net - rt, s"key $k")
      }
    }
  }

  test("property: normalize emits one order row per order and Σ|line_items| item rows") {
    val orderJsonGen = for {
      id <- Gen.chooseNum(1, 1000)
      n <- Gen.chooseNum(0, 4)
      nullItems <- Gen.oneOf(true, false)
    } yield {
      val items =
        if (nullItems && n == 0) "null"
        else (1 to n).map(j =>
          s"""{"product_id": $j, "variation_id": 0, "sku": "s$j", "name": "p$j",
              "quantity": "2", "price": "1.5", "total": "3.0", "subtotal": "3.0",
              "tax_class": ""}""").mkString("[", ",", "]")
      (id, n,
        s"""{"id": $id, "status": "completed", "currency": "EUR",
            "customer_id": 7, "date_created_gmt": "2024-01-0${id % 9 + 1}T00:00:00",
            "date_created": null, "discount_total": "0", "discount_tax": "0",
            "shipping_total": "x", "shipping_tax": "", "cart_tax": "0",
            "total_tax": "1.0", "total": "10.0",
            "billing": {"country": "DE", "city": "B"},
            "line_items": $items}""")
    }
    for (ordersRaw0 <- samples(Gen.listOf(orderJsonGen), 6)) {
      val ordersRaw = ordersRaw0.distinctBy(_._1)
      val raw = SparkTestSession.readJson(
        graft.model.WooSchemas.rawOrder, ordersRaw.map(_._3): _*)
      val (o, it) = Normalize(raw)
      assert(o.count() == ordersRaw.length.toLong)
      assert(it.count() == ordersRaw.map(_._2).sum.toLong)
      // tolerant cast: unparseable "x" and "" money strings become 0.0
      if (ordersRaw.nonEmpty) {
        val st = o.select("shipping_total").distinct().collect().map(_.getDouble(0)).toSet
        assert(st == Set(0.0))
      }
    }
  }

  test("property: alignColumns always yields exactly the target schema") {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType)))
    val colPool = Seq("b" -> "string", "c" -> "double", "d" -> "int")
    for (present <- samples(Gen.someOf(colPool), 8)) {
      val df = present.foldLeft(spark.range(3).toDF("a")) {
        case (acc, (name, tpe)) => acc.withColumn(name, lit(1).cast(tpe))
      }
      val aligned = Load.alignColumns(df, target)
      assert(aligned.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        target.fields.map(f => (f.name, f.dataType)).toSeq)
      assert(aligned.count() == 3)
    }
  }
}
