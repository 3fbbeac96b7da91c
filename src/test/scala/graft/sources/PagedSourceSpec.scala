package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class PagedSourceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("fetchAll accumulates pages and stops on the first short page") {
    var calls = Vector.empty[Int]
    val rows = PagedSource.fetchAll(3) { p =>
      calls :+= p
      p match {
        case 1 => Seq("a", "b", "c")
        case 2 => Seq("d", "e", "c") // full page → keep going
        case 3 => Seq("f")           // short page → stop
        case _ => fail(s"page $p should never be requested")
      }
    }
    assert(rows == Seq("a", "b", "c", "d", "e", "c", "f"))
    assert(calls == Vector(1, 2, 3))
  }

  test("exact multiple of page size costs exactly one extra empty fetch") {
    var calls = 0
    val rows = PagedSource.fetchAll(2) { p =>
      calls += 1
      if (p <= 2) Seq(p * 10, p * 10 + 1) else Seq.empty
    }
    assert(rows == Seq(10, 11, 20, 21))
    assert(calls == 3) // reference semantics: stop only after empty page
  }

  test("empty first page yields an empty batch, one call") {
    assert(PagedSource.fetchAll(5)(_ => Seq.empty[Int]).isEmpty)
  }

  test("page fetch errors propagate (S2: HTTP >= 400 raises)") {
    val e = intercept[RuntimeException] {
      PagedSource.fetchAll(2, RetryPolicy.none) { _ =>
        throw new RuntimeException("HTTP 500")
      }
    }
    assert(e.getMessage == "HTTP 500")
  }

  test("transient failure on page N succeeds on retry; only page N refetches") {
    var sleeps = Vector.empty[Long]
    var failures = Map(2 -> 1) // page 2 fails once
    var calls = Vector.empty[Int]
    val rows = PagedSource.fetchAll(
      2, RetryPolicy(retries = 2, delayMs = 30000L, sleep = sleeps :+= _)) { p =>
      calls :+= p
      if (failures.getOrElse(p, 0) > 0) {
        failures += p -> (failures(p) - 1)
        throw new java.io.IOException(s"transient 503 on page $p")
      }
      if (p <= 2) Seq(p * 10, p * 10 + 1) else Seq.empty
    }
    assert(rows == Seq(10, 11, 20, 21))
    assert(calls == Vector(1, 2, 2, 3)) // page 2 retried alone, scan not restarted
    assert(sleeps == Vector(30000L))    // reference backoff between attempts
  }

  test("permanent failure exhausts the retry budget then propagates (S2)") {
    var sleeps = 0
    var calls = 0
    val e = intercept[java.io.IOException] {
      PagedSource.fetchAll(
        2, RetryPolicy(retries = 2, delayMs = 30000L, sleep = _ => sleeps += 1)) { _ =>
        calls += 1
        throw new java.io.IOException("HTTP 500")
      }
    }
    assert(e.getMessage == "HTTP 500")
    assert(calls == 3 && sleeps == 2) // 1 attempt + 2 retries, then raise
  }

  test("initTable creates an empty typed table once, never overwrites (K1)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-init").toString
    val path = s"$dir/t.parquet"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    graft.etl.Load.initTable(spark, path, schema)
    val t0 = spark.read.parquet(path)
    assert(t0.schema == schema && t0.count() == 0)
    // write a row, re-init: data must survive (CREATE TABLE IF NOT EXISTS)
    import spark.implicits._
    graft.etl.Load.upsertParquet(spark, path, Seq((1L, "x")).toDF("id", "name"), Seq("id"))
    graft.etl.Load.initTable(spark, path, schema)
    assert(spark.read.parquet(path).count() == 1)
  }

  // ---- live HTTP transport (HttpApiClient) against a stub server ----

  /** Stub WooCommerce-ish server: query-string auth (401 without the
    * params — wc_client's query_string_auth), 3 pages of orders at
    * per_page=2, a /flaky route that 500s its first two hits, always
    * counting requests. JDK-built-in HttpServer — zero dependencies. */
  private def withStubServer[T](f: (String, () => Int, () => Int) => T): T = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val flakyHits = new java.util.concurrent.atomic.AtomicInteger(0)
    def params(ex: com.sun.net.httpserver.HttpExchange): Map[String, String] =
      Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
        .filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    def authed(p: Map[String, String]): Boolean =
      p.get("consumer_key").contains("ck_test") &&
        p.get("consumer_secret").contains("cs_test")
    server.createContext("/wp-json/wc/v3/orders",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        hits.incrementAndGet()
        val p = params(ex)
        if (!authed(p)) respond(ex, 401, """{"code":"unauthorized"}""")
        else {
          val page = p("page").toInt
          val per = p("per_page").toInt
          assert(per == 2, s"stub built for per_page=2, got $per")
          // 5 orders total → pages [1,2], [3,4], [5]
          val items = (1 to 5).slice((page - 1) * per, page * per)
            .map(i => s"""{"id":$i,"status":"completed","total":"$i.50"}""")
          respond(ex, 200, items.mkString("[", ",", "]"))
        }
      })
    server.createContext("/wp-json/wc/v3/flaky",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val n = flakyHits.incrementAndGet()
        if (!authed(params(ex))) respond(ex, 401, """{"code":"unauthorized"}""")
        else if (n <= 2) respond(ex, 500, """{"code":"transient"}""")
        else respond(ex, 200, """[{"id":42,"status":"completed","total":"9.99"}]""")
      })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/wp-json/wc/v3",
      () => hits.get(), () => flakyHits.get())
    finally server.stop(0)
  }

  test("HTTP round-trip: query-string auth, paged fetch, short-page stop, schema-explicit decode") {
    withStubServer { (base, hits, _) =>
      val client = new HttpApiClient(base, "ck_test", "cs_test")
      val items = PagedSource.fetchAll(2, RetryPolicy.none)(
        p => client.getPage("orders", p, 2))
      assert(items.size == 5)
      assert(hits() == 3, "5 rows at per_page=2 is exactly 3 requests")
      // hand-off to Spark under an EXPLICIT schema, never inference
      import spark.implicits._
      val sch = StructType(Seq(
        StructField("id", LongType), StructField("status", StringType),
        StructField("total", StringType)))
      val df = spark.read.schema(sch).json(spark.createDataset(items))
      assert(df.count() == 5)
      assert(df.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L, 5L))
      assert(df.filter($"id" === 3L).select("total").head().getString(0) == "3.50")
    }
  }

  test("HTTP 500 retries the single page and succeeds; HTTP 401 propagates immediately, never retried") {
    withStubServer { (base, _, flakyHits) =>
      val client = new HttpApiClient(base, "ck_test", "cs_test")
      val policy = RetryPolicy(retries = 2, delayMs = 0,
        retryOn = HttpApiClient.transientOnly)
      // two 500s then success: the retry budget covers exactly that
      val got = PagedSource.fetchAll(2, policy)(
        p => client.getPage("flaky", p, 2))
      assert(got.size == 1 && got.head.contains("\"id\":42"))
      assert(flakyHits() == 3, "500 must retry the page, not abort")
      // 401 with a retry budget available: ONE request, typed, immediate
      val bad = new HttpApiClient(base, "ck_wrong", "cs_wrong")
      val before = flakyHits()
      val e = intercept[HttpStatusException] {
        PagedSource.fetchAll(2, policy)(p => bad.getPage("flaky", p, 2))
      }
      assert(e.status == 401)
      assert(e.getMessage.contains("401"))
      assert(flakyHits() == before + 1,
        "a 401 must propagate on the FIRST attempt — retrying auth failures is hostile")
    }
  }

  test("HttpApiClient edges: missing credentials fail at construction; array splitter handles nesting and strings") {
    intercept[IllegalArgumentException](new HttpApiClient("", "ck", "cs"))
    intercept[IllegalArgumentException](new HttpApiClient("http://x", "", "cs"))
    assert(HttpApiClient.splitJsonArray("[]") == Seq.empty)
    assert(HttpApiClient.splitJsonArray("""[1, 2, 3]""") == Seq("1", "2", "3"))
    assert(HttpApiClient.splitJsonArray(
      """[{"a":[1,2],"b":"x,y"},{"c":{"d":"}"}}]""") ==
      Seq("""{"a":[1,2],"b":"x,y"}""", """{"c":{"d":"}"}}"""))
    assert(HttpApiClient.splitJsonArray("""[{"s":"a\"b,c"}]""") ==
      Seq("""{"s":"a\"b,c"}"""))
    intercept[IllegalArgumentException](HttpApiClient.splitJsonArray("""{"not":"array"}"""))
    // a missing comma between balanced elements must fail LOUDLY — the
    // pre-fix scan balanced out and returned one non-JSON mega-element
    // that the PERMISSIVE downstream reader turned into silent nulls
    intercept[IllegalArgumentException](
      HttpApiClient.splitJsonArray("""[{"a":1}{"a":2}]"""))
    intercept[IllegalArgumentException](
      HttpApiClient.splitJsonArray("""["a" "b"]"""))
    // 429/408 are transient (rate limit / request timeout: backoff is
    // the right response); other 4xx stay permanent
    assert(HttpApiClient.transientOnly(new HttpStatusException(429, "slow down")))
    assert(HttpApiClient.transientOnly(new HttpStatusException(408, "timeout")))
    assert(!HttpApiClient.transientOnly(new HttpStatusException(401, "denied")))
    assert(HttpApiClient.transientOnly(new HttpStatusException(503, "busy")))
  }
}
