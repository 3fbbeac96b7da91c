package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Pins the oracle-SQL typing convention that broke `k27_constrained_load`
  * in round 16: DuckDB widens `SUM(BIGINT)` to HUGEINT (int128), the
  * driver's result hash is type-sensitive, and Spark emits int64 — so a
  * final column that is a bare integer SUM hash-mismatches even when the
  * values are identical. The repo convention (ExtQueries.scala oracle
  * notes): every oracle SUM over an integer expression is CAST back to
  * BIGINT, either directly (`CAST(SUM(..) AS BIGINT)`) or downstream in a
  * later CTE before the final projection.
  *
  * Textual SQL carries no types, so this spec checks the mechanically
  * decidable core of the convention: any `SUM(` whose argument's own
  * outermost cast is an integer type (`.. AS BIGINT)` etc.) must be
  * directly wrapped in `CAST(` — that exact spelling is what k27 was
  * missing. Sums whose integer-ness is only implied by column types
  * (e.g. `SUM(qv[i])` in a CTE) are out of scope here; those are covered
  * by the driver's per-query hash check itself. */
class OracleSqlConventionSpec extends AnyFunSuite {

  private val intTypes = Set("BIGINT", "INTEGER", "INT", "SMALLINT",
    "TINYINT", "HUGEINT", "UBIGINT", "UINTEGER")

  /** Balanced-paren argument of the call whose '(' is at `open`. */
  private def argOf(sql: String, open: Int): Option[String] = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return Some(sql.substring(open + 1, i))
        case _ =>
      }
      i += 1
    }
    None
  }

  /** The LAST `AS <type>` at depth 0 within the argument — the argument's
    * outermost cast target, if the argument is itself a CAST. */
  private def outermostCastType(arg: String): Option[String] = {
    val upper = arg.toUpperCase(java.util.Locale.ROOT)
    var depth = 0
    var last: Option[String] = None
    val as = raw"\bAS\s+([A-Z]+)".r
    // walk matches, tracking depth at each match start
    var idx = 0
    for (m <- as.findAllMatchIn(upper)) {
      while (idx < m.start) {
        upper.charAt(idx) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        idx += 1
      }
      // depth 1 = inside the single CAST( that spans the whole argument;
      // the AS keyword of `CAST(x AS T)` sits one level inside its paren.
      if (depth == 1 && upper.trim.startsWith("CAST(")) last = Some(m.group(1))
    }
    last
  }

  /** Start of the FINAL top-level projection: the last `SELECT` at paren
    * depth 0. Integer SUMs before it live in CTEs/subqueries (fine when
    * re-cast downstream — the driver hashes only final columns); a SUM
    * anywhere at or after it feeds the final projection regardless of
    * how it is parenthesized (COALESCE(SUM(..)), (SUM(..)) — the
    * round-16 class escapes a naive depth filter through exactly those),
    * so there it must carry the direct CAST wrapper. */
  private def finalSelectAt(sql: String): Int = {
    val upper = sql.toUpperCase(java.util.Locale.ROOT)
    var depth = 0
    var last = 0
    var i = 0
    while (i < upper.length) {
      upper.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'S' if depth == 0 && upper.startsWith("SELECT", i) &&
            (i == 0 || !upper.charAt(i - 1).isLetterOrDigit) =>
          last = i
        case _ =>
      }
      i += 1
    }
    last
  }

  private def violations(name: String, sql: String): Seq[String] = {
    val upper = sql.toUpperCase(java.util.Locale.ROOT)
    val finalAt = finalSelectAt(sql)
    val out = Seq.newBuilder[String]
    var from = 0
    while ({ val at = upper.indexOf("SUM", from); at >= 0 && {
      from = at + 3
      // must be the function token, not a substring of an identifier
      val isWord = at > 0 &&
        (upper.charAt(at - 1).isLetterOrDigit || upper.charAt(at - 1) == '_')
      val open = upper.indexWhere(!_.isWhitespace, at + 3)
      if (!isWord && open >= 0 && upper.charAt(open) == '(' &&
          at >= finalAt) {
        argOf(sql, open).foreach { arg =>
          if (outermostCastType(arg).exists(intTypes)) {
            // integer-cast argument: require the CAST(SUM(..) wrapper
            val before = upper.substring(0, at).reverse.dropWhile(_.isWhitespace)
            if (!before.startsWith("(TSAC")) // reversed "CAST("
              out += s"$name: SUM over integer-cast argument not wrapped " +
                s"in CAST(.. AS BIGINT) — '${sql.substring(at, math.min(sql.length, at + 80)).replaceAll("\\s+", " ")}'"
          }
        }
      }
      true
    }}) ()
    out.result()
  }

  test("no oracle final column is a bare integer SUM (k27 regression class)") {
    val all = graft.SparkEntry.oracleSql
    assert(all.nonEmpty)
    val bad = all.toSeq.sortBy(_._1).flatMap { case (n, sql) => violations(n, sql) }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("the checker itself catches the round-16 k27 spelling") {
    val bare = "SELECT s, SUM(CAST(round(p*100) AS BIGINT)) AS c FROM t GROUP BY 1"
    assert(violations("demo", bare).nonEmpty)
    val fixed = "SELECT s, CAST(SUM(CAST(round(p*100) AS BIGINT)) AS BIGINT) AS c FROM t GROUP BY 1"
    assert(violations("demo", fixed).isEmpty)
    // double-cast args are fine bare: the argument's outermost type is DOUBLE
    val dbl = "SELECT SUM(1.0 / CAST(CAST(1 AS BIGINT) << mr AS DOUBLE)) AS x FROM t"
    assert(violations("demo", dbl).isEmpty)
    // CTE-interior sums are fine bare — they are re-cast downstream
    val cte = "WITH a AS (SELECT SUM(CAST(x AS BIGINT)) AS s FROM t) " +
      "SELECT CAST(s AS DOUBLE) AS d FROM a"
    assert(violations("demo", cte).isEmpty)
    // parenthesized escapes of the final projection are still caught:
    // COALESCE(SUM(..)) and (SUM(..)) widen to HUGEINT exactly like the
    // bare spelling — a naive depth filter exempted them
    val coal = "SELECT COALESCE(SUM(CAST(round(p*100) AS BIGINT)), 0) AS c FROM t"
    assert(violations("demo", coal).nonEmpty)
    val paren = "SELECT (SUM(CAST(x AS BIGINT))) AS c FROM t"
    assert(violations("demo", paren).nonEmpty)
  }
}
