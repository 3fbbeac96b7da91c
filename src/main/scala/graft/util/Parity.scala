package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Bit-exact float parity between Spark and the DuckDB oracle.
  *
  * A plain `SUM(double)` is order-dependent: Spark's partial/final
  * aggregation and DuckDB's vectorized sum visit rows in different orders,
  * so the last few ulps differ and the driver's hash compare fails even
  * though both answers are "right". The reference keeps all money as DOUBLE
  * (reference `src/etl/load/ddl.sql:13-22`, cast helper
  * `src/etl/transform/normalize_orders.py:6-10`), so we preserve double
  * inputs/outputs but make the *aggregation* exact:
  *
  *   1. each row-level double is cast to DECIMAL(24,6) — per-row, both
  *      engines see the identical IEEE double. Scale 6 matters: money
  *      expressions here have at most 4 true decimal digits (price·rate),
  *      so the nearest 1e-6 boundary is ≥1e-5 away and both engines round
  *      identically (at scale 2 the true value can sit ON the boundary and
  *      Spark/DuckDB break the tie differently);
  *   2. the SUM runs in exact decimal arithmetic (order-independent);
  *   3. the result is cast back to DOUBLE (a single deterministic rounding).
  *
  * Sums of integral-valued doubles (e.g. l_quantity) are exact in binary
  * anyway and use plain SUM.
  */
object Parity {
  private val Money = DecimalType(24, 6)

  /** Exact order-independent sum of a money-like double column. */
  def moneySum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** moneySum with empty-set → 0.0, as the reference's dashboards do with
    * COALESCE(SUM(...), 0) (reference `src/dashboard/app.py:35-38`). */
  def moneySum0(c: Column): Column = coalesce(moneySum(c), lit(0.0))

  /** Deterministic average: exact decimal sum / count, both doubles. */
  def moneyAvg(c: Column): Column =
    moneySum(c) / nullif(count(c), lit(0L)).cast(DoubleType)

  /** DuckDB-side twin of [[moneySum]]. */
  def moneySumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(24,6))) AS DOUBLE)"

  def moneySum0Sql(expr: String): String =
    s"COALESCE(${moneySumSql(expr)}, 0.0)"

  def moneyAvgSql(expr: String): String =
    s"${moneySumSql(expr)} / CAST(NULLIF(COUNT($expr), 0) AS DOUBLE)"
}
