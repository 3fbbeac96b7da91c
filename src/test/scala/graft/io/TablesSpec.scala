package graft.io

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins [[Tables.events]] against every events-fixture vintage the driver
  * has shipped. Round 8 regression: the driver regenerated events.parquet
  * with `ts` as timestamp[us] where it used to be TIMESTAMP(NANOS), and the
  * reader's hard-coded nanos rebuild killed all seven events queries. The
  * reader now dispatches on the INFERRED physical type; this spec writes a
  * tiny fixture per vintage and asserts each serves the same instants as a
  * session-zoned TimestampType column, so the next regeneration cannot
  * zero the suite again.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // 2024-03-01T12:34:56.789Z and one second later, as epoch micros.
  private val micros = Seq(1709296496789000L, 1709296497789000L)

  private def tmpDir(): String = {
    val d = Files.createTempDirectory("tables-spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Read via Tables.events and return (dataType, instants-as-epoch-micros). */
  private def served(dir: String): (DataType, Seq[Long]) = {
    Tables.clearSchemaCache() // temp dirs are rewritten per test; never stale
    val df = Tables.events(spark, dir)
    val tpe = df.schema("ts").dataType
    val got = df.orderBy("event_id")
      .select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).toSeq
    (tpe, got)
  }

  private def baseRows(ts: Seq[java.lang.Object]): Seq[org.apache.spark.sql.Row] =
    ts.zipWithIndex.map { case (t, i) =>
      org.apache.spark.sql.Row(i.toLong, t, 100L + i, "click", 1.5 + i, "{}")
    }

  private def writeFixture(dir: String, tsField: StructField, ts: Seq[java.lang.Object]): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), tsField, StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(baseRows(ts).asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("nanos vintage: int64 ts is rebuilt as micros TimestampType") {
    // TIMESTAMP(NANOS) under the pinned nanosAsLong conf surfaces as
    // BIGINT — a plain int64 column exercises the identical inferred
    // schema and dispatch branch.
    val dir = tmpDir()
    writeFixture(dir, StructField("ts", LongType),
      micros.map(m => java.lang.Long.valueOf(m * 1000L)))
    val (tpe, got) = served(dir)
    assert(tpe === TimestampType)
    assert(got === micros)
  }

  test("timestamp[us] NTZ vintage (current fixtures) is served as the same UTC instants") {
    val dir = tmpDir()
    writeFixture(dir, StructField("ts", TimestampNTZType),
      micros.map(m => java.time.LocalDateTime.ofEpochSecond(
        m / 1000000L, (m % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)))
    val (tpe, got) = served(dir)
    assert(tpe === TimestampType)
    assert(got === micros)
  }

  test("timestamp[us, UTC] vintage is served as-is") {
    val dir = tmpDir()
    writeFixture(dir, StructField("ts", TimestampType),
      micros.map(m => Timestamp.from(java.time.Instant.ofEpochSecond(
        m / 1000000L, (m % 1000000L) * 1000L))))
    val (tpe, got) = served(dir)
    assert(tpe === TimestampType)
    assert(got === micros)
  }

  test("an unsupported ts physical type fails loudly at read construction") {
    val dir = tmpDir()
    writeFixture(dir, StructField("ts", StringType),
      micros.map(_ => "2024-03-01 12:34:56"))
    Tables.clearSchemaCache()
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported type"))
  }

  test("NTZ vintage: ts range predicates push into the parquet scan, not post-scan") {
    // The forced-TimestampType read schema (not a post-read cast, which
    // fences the scan) is what keeps time-range queries able to prune row
    // groups on ts stats at 100 TB.
    val dir = tmpDir()
    writeFixture(dir, StructField("ts", TimestampNTZType),
      micros.map(m => java.time.LocalDateTime.ofEpochSecond(
        m / 1000000L, (m % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)))
    Tables.clearSchemaCache()
    val flt = Tables.events(spark, dir)
      .filter(col("ts") > lit("2024-03-01 12:34:57").cast(TimestampType))
    val scan = flt.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"),
      s"ts predicate not pushed to the scan:\n${scan.take(2000)}")
    assert(flt.count() === 1)
  }

  test("fact-table drift gate: temporal and money columns serve query-consumable types") {
    // The driver regenerates /root/testdata between rounds and has changed
    // physical types in place (events.ts, round 8). This gate fails FIRST
    // — one clear spec failure instead of sixty query errors — if a
    // regeneration moves a fact table's temporal or money columns outside
    // what the query suite and oracle SQL consume.
    val dir = "/root/testdata/sf0.001"
    val temporalOk: Set[DataType] = Set(TimestampType, TimestampNTZType, DateType)
    val moneyOk: Set[DataType] = Set(DoubleType, FloatType)
    val checks = Seq(
      (Tables.orders(spark, dir), "orders", Seq("o_orderdate" -> temporalOk,
        "o_totalprice" -> moneyOk)),
      (Tables.lineitem(spark, dir), "lineitem", Seq("l_shipdate" -> temporalOk,
        "l_extendedprice" -> moneyOk, "l_discount" -> moneyOk, "l_quantity" -> moneyOk)),
      (Tables.events(spark, dir), "events", Seq("ts" -> Set[DataType](TimestampType),
        "value" -> moneyOk)),
      (Tables.documents(spark, dir), "documents", Seq(
        "text" -> Set[DataType](StringType),
        "n_chars" -> Set[DataType](LongType, IntegerType))),
      (Tables.embeddings(spark, dir), "embeddings", Seq(
        // QuantizeVec dispatches on float vs double; either element type
        // keeps the whole ANN/near-dup pipeline alive
        "embedding" -> Set[DataType](ArrayType(FloatType, containsNull = true),
          ArrayType(FloatType, containsNull = false),
          ArrayType(DoubleType, containsNull = true),
          ArrayType(DoubleType, containsNull = false)))))
    for ((df, name, cols) <- checks; (c, ok) <- cols) {
      val t = df.schema(c).dataType
      assert(ok.contains(t), s"$name.$c drifted to $t — audit graft.io.Tables " +
        "and the oracle SQL before trusting any query over this table")
    }
  }

  test("the shipped sf0.001 fixture reads green end-to-end") {
    // Whatever vintage the driver last generated, the reader must serve a
    // TimestampType column with sane bounds and full row coverage.
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType === TimestampType)
    val r = df.agg(count(lit(1)), min("ts"), max("ts")).collect().head
    assert(r.getLong(0) > 0)
    assert(r.getTimestamp(1) != null && r.getTimestamp(2) != null)
    assert(!r.getTimestamp(1).after(r.getTimestamp(2)))
  }
}
