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

  /** Exact order-independent sum of a money-like double column.
    *
    * Spelled as a sum over the UNSCALED long (value×10⁶) rather than
    * `sum(decimal)`: per-row conversion AND the accumulator adds are
    * pure primitive codegen (`Math.floor`, long adds) instead of
    * Spark's >18-precision BigDecimal slow path — ~3× faster on
    * money-heavy aggregations (rollup over lineitem: 1.1 s → 0.37 s at
    * sf0.1, the same time as an unrounded double sum) with the same
    * result.
    *
    * Why `floor(c·10⁶ + 0.5)` equals the DECIMAL(24,6) HALF_UP cast on
    * money data: every input is a double approximating a ≤6-decimal
    * quantity (prices/amounts carry 2 decimals; the suite's derived
    * expressions multiply ≤3 such factors), so the exact value of
    * c·10⁶ lies within ~10⁻⁶ of an integer while the double multiply
    * adds ≤~10⁻⁷ relative error — at least 0.4999 away from any .5
    * rounding boundary, so floor(+0.5), round-half-up, and DuckDB's
    * double→decimal cast all pick the same integer. (Exact .5 ties are
    * impossible outright: a tie at scale 6 needs denominator 2·10⁶,
    * which no dyadic rational has.) ParitySpec pins equality against
    * the decimal-cast spelling on randomized money data; the oracle
    * gate pins it against DuckDB end-to-end at three SFs.
    *
    * The final value is reconstructed EXACTLY (decimal × 10⁻⁶ — both
    * operands exact, one terminal rounding to double), matching the
    * oracle's `CAST(SUM(DECIMAL) AS DOUBLE)` single rounding; a direct
    * long→double cast would add a second rounding once the unscaled sum
    * passes 2⁵³. Range: |Σ| < 2⁶³ micro-units ≈ $9.2×10¹² — ANSI mode
    * throws on overflow rather than wrapping (a DECIMAL spelling
    * extends the range to 10¹⁸ if a deployment ever needs it). */
  def moneySum(c: Column): Column = microsToMoney(sum(moneyMicros(c)))

  /** Per-row money→micro-units conversion (the fast half of [[moneySum]],
    * exactness argument above). Exposed for callers that carry the long
    * micros through their own aggregation (windowed/streaming twins) and
    * reconstruct with [[microsToMoney]] at the end. */
  def moneyMicros(c: Column): Column = floor(c * lit(1000000.0) + lit(0.5))

  /** Exact micro-units→money finisher: decimal multiply (both operands
    * exact), ONE terminal rounding to double — matching the oracle's
    * `CAST(SUM(DECIMAL) AS DOUBLE)`. */
  def microsToMoney(c: Column): Column =
    (c.cast(DecimalType(38, 0)) * lit(new java.math.BigDecimal("0.000001")))
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
