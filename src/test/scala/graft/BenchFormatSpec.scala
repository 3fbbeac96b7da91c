package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses the round's bench metrics out of a bounded
  * (2000-char) stdout TAIL: the compact summary line — the LAST thing
  * Bench prints — must stay valid JSON and comfortably inside that
  * bound however large the suite grows, or the round lands with
  * parsed:null (it happened from r05 to r13). This pins both properties
  * at 120 queries with realistically long names, plus the field set the
  * driver reads. */
class BenchFormatSpec extends AnyFunSuite {

  private def line(n: Int): String = {
    val results = (1 to n).map(i =>
      f"x${i}%02d_realistically_long_query_name" -> (0.001 * i))
    Bench.compactSummary(
      total = results.map(_._2).sum,
      results = results,
      totalWarm = results.map(_._2).sum * 0.8,
      storageSec = 7.2345,
      duckFields = """"duck_total":27.80937,"ratio_cold":1.7,"ratio_warm":1.3,"duck_comparable_total":26.72,"ratio_comparable_cold":1.5,"ratio_comparable_warm":1.1,"duck_queries":{"a":1.0},""",
      errs = "[]",
      importSec = 0.633923312,
      loadGateJson = """{"load_start":8.36,"waited_sec":50,"load_at_run":3.63}""",
      sfDir = "/root/testdata/sf0.1",
      idleHistoryJson = """[{"file":"r19a.json","value":52.1,"total_warm":41.2,"storage_sec":6.91,"ratio_cold":1.19,"ratio_warm":0.93},{"file":"r19b.json","value":51.7,"total_warm":40.8,"storage_sec":6.84,"ratio_cold":1.17,"ratio_warm":0.92}]""")
  }

  test("the compact summary stays under the driver tail bound at 120 queries") {
    assert(line(120).length < 1800,
      s"compact summary is ${line(120).length} chars — the 2000-char " +
        "driver tail would truncate it")
  }

  test("the compact summary parses as JSON with the driver's fields") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(line(120)) // throws on malformed JSON
    for (f <- Seq("metric", "value", "n_queries", "queries",
        "queries_omitted", "total_warm", "storage_sec", "duck_total",
        "ratio_cold", "ratio_warm", "errors", "import_sec", "idle_history",
        "load_gate", "detail", "sf"))
      assert(node.has(f), s"driver field '$f' missing from the summary")
    assert(node.get("n_queries").asInt() == 120)
    // the full per-query map is NOT in the compact line (that is what
    // blew the tail at r05) — only the slowest-12 truncation
    assert(node.get("queries").size() == 12)
    assert(node.get("queries_omitted").asInt() == 108)
    assert(!line(120).contains("duck_queries"),
      "the per-query duck map belongs to the full line, never the summary")
  }

  test("the summary is locale-proof (decimal points, not commas)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(line(120))
    } finally java.util.Locale.setDefault(prev)
  }
}
