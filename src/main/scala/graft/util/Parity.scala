package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

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

  /** Exact order-independent sum of a money-like double column.
    *
    * Spelled as a sum over the UNSCALED long (value×10⁶, exact after the
    * decimal cast) rather than `sum(decimal)`: the per-row rounding is
    * the identical DECIMAL(24,6) cast, but the accumulator adds run on
    * primitive longs (codegen) instead of Spark's >18-precision
    * BigDecimal slow path — measurably faster on wide aggregations
    * (rollup/cube money sums) with the same result. The final value is
    * reconstructed EXACTLY (decimal × 10⁻⁶ — both operands exact, one
    * terminal rounding to double), matching the oracle's
    * `CAST(SUM(DECIMAL) AS DOUBLE)` single rounding; a direct
    * long→double cast would add a second rounding once the unscaled sum
    * passes 2⁵³. Range: |Σ| < 2⁶³ micro-units ≈ $9.2×10¹² — ANSI mode
    * throws on overflow rather than wrapping (the DECIMAL(24,6) spelling
    * extends the range to 10¹⁸ if a deployment ever needs it). */
  def moneySum(c: Column): Column =
    (sum((c.cast(Money) * lit(1000000)).cast(LongType))
      .cast(DecimalType(38, 0)) * lit(new java.math.BigDecimal("0.000001")))
      .cast(DoubleType)

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
