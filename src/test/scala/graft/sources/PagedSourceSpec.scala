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
}
